from ionflux.solver.dopri5 import odeint, SolveStats
from ionflux.solver.fixed import odeint_rk4
from ionflux.solver.chained import odeint_chained

__all__ = ["odeint", "odeint_rk4", "odeint_chained", "SolveStats"]
