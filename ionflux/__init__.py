"""ionflux — a TPU-native (JAX/XLA/Pallas) framework for neural-ODE ion-channel
modelling, providing the full capabilities of the reference research codebase
(chonlei/neural-ode-ion-channels, Lei & Mirams 2021) re-designed TPU-first.

Layer map (mirrors reference SURVEY.md §1):
  L0/L1  protocols   — voltage-clamp protocols, jittable V(t) evaluation
  L2     models      — ODE vector fields (HH, Markov, NN-f, NN-d) as pure fns
  L3     solver      — adaptive dopri5 / fixed RK4 under jit, dense output,
                       checkpointed adjoint; Pallas fused-solve kernels
  L4     surface     — observation -> derivative-surface estimation pipeline
  L5     fit         — optax surface trainer; CMA-ES whole-trace fitting
  L6     eval        — MAE/RMSE harness, tables, figure replay
  aux    utils       — checkpoints, torch-free .pt reader, timing
         parallel    — mesh/sharding helpers (vmap/pjit/shard_map)
"""

__version__ = "0.1.0"

from ionflux import protocols, observe
from ionflux.models import registry

__all__ = ["protocols", "observe", "registry", "__version__"]
