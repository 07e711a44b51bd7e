"""Receding-horizon MPC with device-resident warm starts.

The reference carries MPC knobs (``Options.mpc_horizon``/``upsampling``,
``src/struct/options.jl:96-101``) and shift warm-start semantics
(``init_traj!`` with ``s=shift``, ``src/struct/primal_dual_traj.jl:29-44``)
but the replanning loop itself lives in the downstream AlgamesDriving
package.  Here the full loop is first-class and on-device: a ``lax.scan``
over replanning steps, each step re-solving the game warm-started from the
previous solution shifted by one knot, then simulating the "real" plant for
one control interval with ``upsampling`` RK3 substeps.

The whole MPC rollout is one jitted computation, vmappable over scenarios —
the replan-latency benchmark path of BASELINE.md.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .constraints import sets as gcm
from .core.traj import PrimalDual
from .models.integration import rk3_step
from .problem.problem import GameProblem
from .problem.solver import newton_solve
from .utils import pytree_dataclass


@pytree_dataclass
class MPCResult:
    states: jnp.ndarray     # [H+1, n] closed-loop plant states
    controls: jnp.ndarray   # [H, m]  applied controls
    dyn_vio: jnp.ndarray    # [H]    solver dynamics violation per replan
    opt_vio: jnp.ndarray    # [H]    solver stationarity violation per replan
    iters: jnp.ndarray      # [H]    solver iterations per replan
    traj: PrimalDual        # final plan (device-resident warm-start buffer)


def mpc_solve(prob: GameProblem, horizon: int | None = None,
              method: str = "schur") -> MPCResult:
    """Run the receding-horizon loop for ``horizon`` plant steps
    (default ``opts.mpc_horizon``).

    Each step: solve the game from the current plant state (warm start =
    previous plan shifted by ``opts.shift`` — use ``Options(shift=1)`` for
    MPC), apply the first control, integrate the plant ``opts.upsampling``
    RK3 substeps of length ``dt/upsampling``.
    """
    spec, model, opts = prob.spec, prob.model, prob.opts
    H = horizon if horizon is not None else opts.mpc_horizon
    dtype = prob.x0.dtype
    sub_dt = spec.dt / opts.upsampling

    def plant_step(x, u):
        for _ in range(opts.upsampling):
            x = rk3_step(model, x, u, sub_dt)
        return x

    def step(carry, _):
        x, warm, gc = carry
        p = GameProblem(spec=spec, model=model, opts=opts, x0=x,
                        obj=prob.obj, gc=gc)
        out = newton_solve(p, method=method, warm=warm)
        u0 = out.traj.u[0]
        x_next = plant_step(x, u0)
        it = jnp.maximum(out.stats.iter - 1, 0)
        dyn_v = out.stats.dyn_vio[it]
        opt_v = out.stats.opt_vio[it]
        # Dual warm start across replans (opts.dual_reset=False): carry the
        # converged multipliers, restart the penalty schedule.  With
        # dual_reset=True newton_solve resets everything and the carry is
        # equivalent to passing prob.gc.
        gc_next = prob.gc if opts.dual_reset else gcm.reset_penalties(out.gc)
        return ((x_next, out.traj, gc_next),
                (x_next, u0, dyn_v, opt_v, out.stats.iter))

    # First solve cold (no warm start), remaining H-1 steps warm.
    p0 = GameProblem(spec=spec, model=model, opts=opts, x0=prob.x0,
                     obj=prob.obj, gc=prob.gc)
    out0 = newton_solve(p0, method=method)
    u0 = out0.traj.u[0]
    x1 = plant_step(prob.x0, u0)
    it0 = jnp.maximum(out0.stats.iter - 1, 0)
    gc1 = prob.gc if opts.dual_reset else gcm.reset_penalties(out0.gc)

    (xf, traj_f, _), (xs, us, dyns, opts_v, iters) = jax.lax.scan(
        step, (x1, out0.traj, gc1), None, length=H - 1)

    states = jnp.concatenate([prob.x0[None], x1[None], xs], axis=0)
    controls = jnp.concatenate([u0[None], us], axis=0)
    dyn_vio = jnp.concatenate([out0.stats.dyn_vio[it0][None], dyns])
    opt_vio = jnp.concatenate([out0.stats.opt_vio[it0][None], opts_v])
    nit = jnp.concatenate([out0.stats.iter[None], iters])
    return MPCResult(states=states, controls=controls, dyn_vio=dyn_vio,
                     opt_vio=opt_vio, iters=nit, traj=traj_f)


mpc_solve_jit = jax.jit(mpc_solve, static_argnames=("horizon", "method"))
