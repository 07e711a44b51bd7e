from .spec import ProblemSpec, spec_from_model
from .traj import (PrimalDual, delta_step, init_traj, pack_traj, reset_duals,
                   unpack_step, update_traj, zero_traj)

__all__ = [
    "ProblemSpec", "spec_from_model",
    "PrimalDual", "zero_traj", "init_traj", "update_traj", "delta_step",
    "reset_duals", "unpack_step", "pack_traj",
]
