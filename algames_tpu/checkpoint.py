"""Checkpoint / resume for trajectories and solver state.

The reference has no checkpointing (solves run in ms, SURVEY.md §5); its
analogue is the MPC warm start.  For production deployment this module adds
what the reference lacks: dump/restore of ``PrimalDual`` warm-start buffers
and full ``SolveResult`` pytrees, via orbax when available (async,
multi-host-aware) with a plain ``.npz`` fallback.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .core.traj import PrimalDual


def save_traj(path: str, traj: PrimalDual) -> None:
    """Write a PrimalDual warm-start buffer to ``path`` (.npz)."""
    np.savez(path, x=np.asarray(traj.x), u=np.asarray(traj.u),
             lam=np.asarray(traj.lam))


def load_traj(path: str, dtype=None) -> PrimalDual:
    with np.load(path) as z:
        x, u, lam = z["x"], z["u"], z["lam"]
    if dtype is not None:
        x, u, lam = (a.astype(dtype) for a in (x, u, lam))
    return PrimalDual(x=jnp.asarray(x), u=jnp.asarray(u), lam=jnp.asarray(lam))


def save_pytree(path: str, tree: Any) -> None:
    """Checkpoint an arbitrary pytree (SolveResult, GameConstraints AL state,
    batched stats) via orbax if importable, else flattened .npz."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), tree, force=True)
    except Exception:
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        np.savez(path if path.endswith(".npz") else path + ".npz",
                 treedef=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
                 **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def restore_pytree(path: str, example: Any) -> Any:
    """Restore a pytree checkpoint written by :func:`save_pytree`; ``example``
    provides the tree structure (and dtypes for the npz fallback)."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(os.path.abspath(path), item=example)
    except Exception:
        npz = path if path.endswith(".npz") else path + ".npz"
        with np.load(npz, allow_pickle=False) as z:
            leaves_ex, treedef = jax.tree_util.tree_flatten(example)
            leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(len(leaves_ex))]
        return jax.tree_util.tree_unflatten(treedef, leaves)
