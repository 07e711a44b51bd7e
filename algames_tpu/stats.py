"""On-device solver statistics.

TPU-native equivalent of the reference ``Statistics`` and the violation
records (``src/struct/statistics.jl:5-72``, ``src/struct/violations.jl``).
The reference pushes per-iteration records onto host vectors; here the
record is a fixed-capacity stack of device arrays (capacity = the static
iteration budget), scatter-written at the current iteration index so the
whole solve stays jittable and vmappable.  ``iter`` counts valid rows.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .utils import pytree_dataclass


@pytree_dataclass
class Statistics:
    iter: jnp.ndarray       # scalar int32: number of valid records
    outer: jnp.ndarray      # [M] outer-iteration index of each record
    res: jnp.ndarray        # [M] mean-|.|_1 residual norm
    delta: jnp.ndarray      # [M] step-size metric (reference Δ_traj)
    alpha: jnp.ndarray      # [M] accepted line-search step
    dyn_vio: jnp.ndarray    # [M] max dynamics violation
    con_vio: jnp.ndarray    # [M] max control-constraint violation
    sta_vio: jnp.ndarray    # [M] max state-constraint violation
    opt_vio: jnp.ndarray    # [M] max stationarity violation


def init_stats(capacity: int, dtype=jnp.float64) -> Statistics:
    z = jnp.zeros((capacity,), dtype)
    return Statistics(
        iter=jnp.zeros((), jnp.int32),
        outer=jnp.zeros((capacity,), jnp.int32),
        res=z, delta=z, alpha=z,
        dyn_vio=z, con_vio=z, sta_vio=z, opt_vio=z,
    )


def print_stats(stats: Statistics, header: bool = True) -> None:
    """Host-side console table of the recorded iterations (reference
    ``display_solver_header/data``, ``src/utils.jl:37-61``)."""
    from .utils import scn

    it = int(np.asarray(stats.iter)) if hasattr(stats.iter, "shape") else int(stats.iter)
    if header:
        print(f"{'out':<4} {'res':<9} {'Δ':<9} {'dyn':<9} {'con':<9} "
              f"{'sta':<9} {'opt':<9}")
    for i in range(it):
        print(f"{int(stats.outer[i]):<4} {scn(float(stats.res[i])):<9} "
              f"{scn(float(stats.delta[i])):<9} "
              f"{scn(float(stats.dyn_vio[i])):<9} "
              f"{scn(float(stats.con_vio[i])):<9} "
              f"{scn(float(stats.sta_vio[i])):<9} "
              f"{scn(float(stats.opt_vio[i])):<9}")


def record(stats: Statistics, active, outer, res, delta, alpha,
           dyn_vio, con_vio, sta_vio, opt_vio) -> Statistics:
    """Append one record when ``active`` (mask for batched/while-loop use)."""
    i = stats.iter

    def put(arr, val):
        return jnp.where(active, arr.at[i].set(val), arr)

    return Statistics(
        iter=jnp.where(active, i + 1, i),
        outer=put(stats.outer, outer),
        res=put(stats.res, res),
        delta=put(stats.delta, delta),
        alpha=put(stats.alpha, alpha),
        dyn_vio=put(stats.dyn_vio, dyn_vio),
        con_vio=put(stats.con_vio, con_vio),
        sta_vio=put(stats.sta_vio, sta_vio),
        opt_vio=put(stats.opt_vio, opt_vio),
    )
