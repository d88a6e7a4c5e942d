from ionflux.solver.dopri5 import odeint, SolveStats
from ionflux.solver.fixed import odeint_rk4

__all__ = ["odeint", "odeint_rk4", "SolveStats"]
