from ionflux.solver.dopri5 import odeint, SolveStats
from ionflux.solver.fixed import odeint_rk4
from ionflux.solver.chained import odeint_chained
from ionflux.solver.adams import odeint_adams
from ionflux.solver.vcabm import odeint_vcabm
from ionflux.solver.implicit import odeint_rosenbrock
from ionflux.solver.adjoint import odeint_adjoint
from ionflux.solver.batched import (odeint_batched,
                                    odeint_batched_chunked)
from ionflux.solver.analytic import (hh_solve_analytic,
                                     markov_solve_analytic)

__all__ = ["odeint", "odeint_rk4", "odeint_chained", "odeint_adams",
           "odeint_adjoint", "odeint_batched", "odeint_vcabm",
           "odeint_rosenbrock", "odeint_batched_chunked", "SolveStats",
           "hh_solve_analytic", "markov_solve_analytic"]
