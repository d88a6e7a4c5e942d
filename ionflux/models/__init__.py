from ionflux.models import registry
from ionflux.models.hh import (
    hh_rhs,
    hh_rates,
    hh_steady_state,
    a_gate_rhs,
    r_gate_rhs,
)
from ionflux.models.markov import markov_rhs, MARKOV_Y0_REST, MARKOV_Y0_INACT
from ionflux.models.gt_a import gt_a_rhs, gt_a_coeffs
from ionflux.models.nn import (
    mlp_init,
    mlp_apply,
    mlp_sizes,
    nnf_init,
    nnf_rhs,
    nnd_init,
    nnd_rhs,
    nn_surface,
    nnd_surface,
)

__all__ = [
    "registry",
    "hh_rhs",
    "hh_rates",
    "hh_steady_state",
    "a_gate_rhs",
    "r_gate_rhs",
    "markov_rhs",
    "MARKOV_Y0_REST",
    "MARKOV_Y0_INACT",
    "gt_a_rhs",
    "gt_a_coeffs",
    "mlp_init",
    "mlp_apply",
    "mlp_sizes",
    "nnf_init",
    "nnf_rhs",
    "nnd_init",
    "nnd_rhs",
    "nn_surface",
    "nnd_surface",
]
