"""Scenario-batch solving: vmap over initial conditions / targets / penalties.

This is the capability layer the reference lacks entirely (SURVEY.md §2.3):
the whole solver is a pure function, so a Monte-Carlo sweep over thousands of
scenarios is a single ``vmap`` — one compiled program, batch dimension feeding
the MXU in every block solve.
"""
from __future__ import annotations



import jax
import jax.numpy as jnp

from ..problem.problem import GameProblem
from ..problem.solver import newton_solve


def solve_batch(prob: GameProblem, x0s: jnp.ndarray, method: str = "schur",
                keys=None):
    """Solve one game per row of ``x0s`` [B, n]; returns stacked SolveResult."""
    def one(x0, key):
        p = GameProblem(spec=prob.spec, model=prob.model, opts=prob.opts,
                        x0=x0, obj=prob.obj, gc=prob.gc)
        return newton_solve(p, key=key, method=method)

    if keys is None:
        return jax.vmap(lambda x: one(x, None))(x0s)
    return jax.vmap(one)(x0s, keys)


solve_batch_jit = jax.jit(solve_batch, static_argnames=("method",))


def divergence_mask(result) -> jnp.ndarray:
    """Per-lane divergence flags for a batched SolveResult (SURVEY.md §5:
    the batched analogue of failure detection — NaN/exploding lanes are
    masked, not fatal).  True where the final residual is non-finite or the
    trajectory contains non-finite values."""
    it = jnp.maximum(result.stats.iter - 1, 0)
    final_res = jax.vmap(lambda a, i: a[i])(result.stats.res, it)
    bad_res = ~jnp.isfinite(final_res)
    bad_traj = ~jnp.all(jnp.isfinite(
        result.traj.x.reshape(result.traj.x.shape[0], -1)), axis=1)
    return bad_res | bad_traj


def convergence_fraction(result, opts) -> jnp.ndarray:
    """Fraction of lanes whose final violations meet the tolerances."""
    it = result.stats.iter
    idx = jnp.maximum(it - 1, 0)
    take = jax.vmap(lambda a, i: a[i])
    ok = ((take(result.stats.dyn_vio, idx) < opts.eps_dyn)
          & (take(result.stats.con_vio, idx) < opts.eps_con)
          & (take(result.stats.sta_vio, idx) < opts.eps_sta)
          & (take(result.stats.opt_vio, idx) < opts.eps_opt))
    return jnp.mean(ok.astype(jnp.float32))
