from .batch import (convergence_fraction, divergence_mask, solve_batch,
                    solve_batch_jit, solve_many, solve_many_jit)
from .horizon import (solve_tridiagonal_sharded, spike_kkt_method)
from .shard import make_mesh, sharded_monte_carlo, sharded_monte_carlo_jit

__all__ = [
    "solve_batch", "solve_batch_jit", "solve_many", "solve_many_jit",
    "convergence_fraction", "divergence_mask",
    "make_mesh", "sharded_monte_carlo", "sharded_monte_carlo_jit",
    "solve_tridiagonal_sharded", "spike_kkt_method",
]
