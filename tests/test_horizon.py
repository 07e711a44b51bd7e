"""Horizon (sequence) parallelism: sharded SPIKE KKT solve.

Correctness gates: the distributed partitioned-Thomas solve must agree with
the sequential block-Thomas oracle on real KKT systems, at every mesh size,
and a full long-horizon Newton solve driven through ``method=spike`` must
match the sequential solve lane-for-lane.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

import algames_tpu as ag
from algames_tpu.problem import residual as R
from algames_tpu.problem.linear_solver import solve_tridiagonal
from algames_tpu.parallel.horizon import (solve_tridiagonal_sharded,
                                          spike_kkt_method)


def _kkt_system(p=2, N=17, seed=0):
    """Real Jacobian blocks + residual from a mid-solve iterate."""
    model = ag.unicycle_game(p=p)
    dt = 0.1
    spec = ag.spec_from_model(model, N, dt)
    obj = ag.game_objective(spec, [jnp.ones(4)] * p, [0.5 * jnp.ones(2)] * p,
                            [jnp.zeros(4)] * p, [jnp.zeros(2)] * p,
                            dtype=jnp.float64)
    gc = ag.game_constraints(spec)
    gc = ag.add_collision_avoidance(spec, gc, 0.1)
    key = jax.random.PRNGKey(seed)
    x0 = jax.random.normal(key, (spec.n,), jnp.float64)
    traj = ag.init_traj(spec, x0, key=key, amplitude=0.1)
    res = R.residual(model, spec, obj, gc, traj)
    jb = R.jacobian_blocks(model, spec, obj, gc, traj, reg_x=1e-3, reg_u=1e-3)
    D, U, L = R.build_tridiagonal(spec, jb)
    b = R.residual_knot_blocks(spec, res)
    return spec, jb, D, U, L, b


def _hz_mesh(nd):
    return Mesh(np.asarray(jax.devices()[:nd]), ("hz",))


def test_spike_matches_thomas_every_mesh_size():
    spec, jb, D, U, L, b = _kkt_system(p=2, N=17)   # T = 16 knots
    ref = solve_tridiagonal(spec, D, U, L, b)
    for nd in (1, 2, 4, 8):
        mesh = _hz_mesh(nd)
        out = jax.jit(lambda D, U, L, b, m=mesh: solve_tridiagonal_sharded(
            spec, D, U, L, b, m))(D, U, L, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-9, atol=1e-9)


def test_spike_full_newton_solve_long_horizon():
    """N=33 (T=32) unicycle game solved with the horizon-sharded KKT step
    matches the sequential tridiag solve."""
    p, N, dt = 2, 33, 0.05
    model = ag.unicycle_game(p=p)
    spec = ag.spec_from_model(model, N, dt)
    obj = ag.game_objective(spec, [jnp.ones(4)] * p, [0.5 * jnp.ones(2)] * p,
                            [jnp.asarray([1.5, 0.2 * i, 0.0, 0.2])
                             for i in range(p)],
                            [jnp.zeros(2)] * p, dtype=jnp.float64)
    gc = ag.game_constraints(spec)
    gc = ag.add_collision_avoidance(spec, gc, 0.1)
    opts = ag.Options(outer_iter=2, inner_iter=6)
    x0 = jnp.asarray([0., 0., 0.2, 0.2, 0., 0., 0.4, 0.4], jnp.float64)
    prob = ag.game_problem(N, dt, x0, model, opts, obj, gc)

    ref = ag.newton_solve_jit(prob, method="tridiag")
    mesh = _hz_mesh(8)
    out = jax.jit(lambda pr: ag.newton_solve(
        pr, method=spike_kkt_method(mesh)))(prob)
    np.testing.assert_allclose(np.asarray(out.traj.x),
                               np.asarray(ref.traj.x), rtol=1e-8, atol=1e-8)
    assert int(out.stats.iter) == int(ref.stats.iter)


def test_spike_singleton_axis_is_plain_thomas():
    spec, jb, D, U, L, b = _kkt_system(p=2, N=9)    # T = 8
    mesh = _hz_mesh(1)
    out = jax.jit(lambda D, U, L, b: solve_tridiagonal_sharded(
        spec, D, U, L, b, mesh))(D, U, L, b)
    ref = solve_tridiagonal(spec, D, U, L, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-10, atol=1e-10)
