"""End-to-end solver convergence oracles (mirrors reference
test/problem/solver_methods.jl:1-182 tolerances exactly)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import algames_tpu as ag


def _lqr_obj(spec, p, model):
    return ag.game_objective(
        spec,
        Q=[jnp.ones(model.ni[i]) for i in range(p)],
        R=[0.5 * jnp.ones(model.mi[i]) for i in range(p)],
        xf=[jnp.zeros(model.ni[i]) for i in range(p)],
        uf=[-jnp.ones(model.mi[i]) for i in range(p)],
        dtype=jnp.float64)


def _final(stats):
    i = int(stats.iter)
    return {k: float(getattr(stats, k)[i - 1])
            for k in ("res", "dyn_vio", "con_vio", "sta_vio", "opt_vio")}, i


def test_p1_linear_one_newton_iteration():
    """p=1 DI, N=20: mean-res < 1e-6 after 1 outer x 1 inner
    (reference solver_methods.jl test :27-34)."""
    model = ag.double_integrator_game(p=1)
    N, dt = 20, 0.1
    spec = ag.spec_from_model(model, N, dt)
    obj = _lqr_obj(spec, 1, model)
    gc = ag.game_constraints(spec)
    opts = ag.Options(outer_iter=1, inner_iter=1, ls_iter=25, reg_0=1e-7,
                      eps_dyn=1e-10, eps_opt=1e-10)
    prob = ag.game_problem(N, dt, jnp.array([1.0, 1.0, 0.0, 0.9]), model,
                           opts, obj, gc)
    for method in ("dense", "tridiag"):
        out = ag.newton_solve(prob, method=method)
        fin, _ = _final(out.stats)
        assert fin["res"] < 1e-6
        assert fin["dyn_vio"] < 1e-6


def test_p1_nonlinear_unicycle():
    """p=1 unicycle, full budget -> 1e-6 (reference :36-66)."""
    model = ag.unicycle_game(p=1)
    N, dt = 20, 0.1
    spec = ag.spec_from_model(model, N, dt)
    obj = _lqr_obj(spec, 1, model)
    gc = ag.game_constraints(spec)
    opts = ag.Options(outer_iter=7, inner_iter=20, reg_0=1e-7,
                      eps_dyn=1e-10, eps_opt=1e-10)
    prob = ag.game_problem(N, dt, jnp.array([1.0, 1.0, 0.0, 0.9]), model,
                           opts, obj, gc)
    out = ag.newton_solve_jit(prob)
    fin, _ = _final(out.stats)
    assert fin["res"] < 1e-6 and fin["dyn_vio"] < 1e-6


def test_p2_linear_one_newton_iteration():
    """p=2 DI, N=20, 1x1 budget (reference :69-99)."""
    model = ag.double_integrator_game(p=2)
    N, dt = 20, 0.1
    spec = ag.spec_from_model(model, N, dt)
    obj = _lqr_obj(spec, 2, model)
    gc = ag.game_constraints(spec)
    opts = ag.Options(outer_iter=1, inner_iter=1, reg_0=1e-7,
                      eps_dyn=1e-10, eps_opt=1e-10)
    x0 = jnp.array([1.0, 2.0, 1.0, 2.0, 0.0, 0.0, 0.9, 0.9])
    prob = ag.game_problem(N, dt, x0, model, opts, obj, gc)
    out = ag.newton_solve(prob)
    fin, _ = _final(out.stats)
    assert fin["res"] < 1e-6 and fin["dyn_vio"] < 1e-6


def test_p2_nonlinear_unicycle():
    """p=2 unicycle, full budget (reference :102-129)."""
    model = ag.unicycle_game(p=2)
    N, dt = 20, 0.1
    spec = ag.spec_from_model(model, N, dt)
    obj = _lqr_obj(spec, 2, model)
    gc = ag.game_constraints(spec)
    opts = ag.Options(outer_iter=7, inner_iter=20, reg_0=1e-7,
                      eps_dyn=1e-10, eps_opt=1e-10)
    x0 = jnp.array([1.0, 2.0, 1.0, 2.0, 0.0, 0.0, 0.9, 0.9])
    prob = ag.game_problem(N, dt, x0, model, opts, obj, gc)
    out = ag.newton_solve_jit(prob)
    fin, _ = _final(out.stats)
    assert fin["res"] < 1e-6 and fin["dyn_vio"] < 1e-6


def test_p2_constrained():
    """p=2 unicycle + collision r=0.05 + |u|<=1 + 3 circles: all four
    violations < 1e-3 within 20x20 (reference :131-182)."""
    model = ag.unicycle_game(p=2)
    N, dt = 20, 0.1
    spec = ag.spec_from_model(model, N, dt)
    obj = _lqr_obj(spec, 2, model)
    gc = ag.game_constraints(spec)
    gc = ag.add_collision_avoidance(spec, gc, 0.05)
    gc = ag.add_control_bound(spec, gc, jnp.ones(spec.m), -jnp.ones(spec.m))
    gc = ag.add_circle_constraint(spec, gc, jnp.array([1.0, 2.0, 3.0]),
                                  jnp.array([1.0, 2.0, 3.0]),
                                  jnp.array([0.1, 0.1, 0.1]))
    opts = ag.Options(outer_iter=20, inner_iter=20)
    x0 = jnp.array([1.0, 2.0, 1.0, 2.0, 0.0, 0.0, 0.9, 0.9])
    prob = ag.game_problem(N, dt, x0, model, opts, obj, gc)
    out = ag.newton_solve_jit(prob)
    fin, _ = _final(out.stats)
    assert fin["dyn_vio"] < 1e-3
    assert fin["con_vio"] < 1e-3
    assert fin["sta_vio"] < 1e-3
    assert fin["opt_vio"] < 1e-3


def test_vmap_batch_matches_single():
    """Batched solves reproduce single solves lane-for-lane."""
    model = ag.double_integrator_game(p=2)
    N, dt = 10, 0.1
    spec = ag.spec_from_model(model, N, dt)
    obj = _lqr_obj(spec, 2, model)
    gc = ag.game_constraints(spec)
    opts = ag.Options(outer_iter=2, inner_iter=3, reg_0=1e-7)
    x0s = jnp.stack([
        jnp.array([1.0, 2.0, 1.0, 2.0, 0.0, 0.0, 0.9, 0.9]),
        jnp.array([0.5, -1.0, 0.3, 0.7, 0.1, 0.0, -0.9, 0.2]),
        jnp.array([2.0, 2.0, -1.0, -2.0, 0.0, 0.5, 0.9, -0.9])])

    def solve_one(x0):
        prob = ag.game_problem(N, dt, x0, model, opts, obj, gc)
        return ag.newton_solve(prob)

    batched = jax.jit(jax.vmap(solve_one))(x0s)
    for b in range(3):
        single = solve_one(x0s[b])
        np.testing.assert_allclose(np.asarray(batched.traj.x[b]),
                                   np.asarray(single.traj.x),
                                   rtol=1e-10, atol=1e-12)
        assert int(batched.stats.iter[b]) == int(single.stats.iter)


def test_quadrotor_solver():
    """p=2 quadrotor hover-to-target converges on dynamics violation."""
    model = ag.quadrotor_game(p=2)
    N, dt = 10, 0.1
    spec = ag.spec_from_model(model, N, dt)
    p = 2
    obj = ag.game_objective(
        spec,
        Q=[jnp.ones(12) for _ in range(p)],
        R=[jnp.ones(4) for _ in range(p)],
        xf=[jnp.concatenate([jnp.array([float(i), 0.0, 1.0]), jnp.zeros(9)])
            for i in range(p)],
        uf=[jnp.full((4,), 0.5 * 9.81 / 4 / model.kf) for _ in range(p)],
        dtype=jnp.float64)
    gc = ag.game_constraints(spec)
    opts = ag.Options(outer_iter=3, inner_iter=10, reg_0=1e-6)
    x0 = jnp.zeros(24).at[4].set(0.5)  # player-2 y = 0.5
    prob = ag.game_problem(N, dt, x0, model, opts, obj, gc)
    out = ag.newton_solve_jit(prob)
    fin, _ = _final(out.stats)
    assert fin["dyn_vio"] < 1e-4
    assert np.isfinite(fin["res"])


def test_flat_loop_matches_nested():
    """The flattened (k,l) state-machine solve (Options.flat_loop, the
    batched-straggler-mitigation path) is bitwise identical per lane to the
    nested outer/inner while_loop (reference control flow,
    solver_methods.jl:30-62)."""
    import dataclasses
    model = ag.unicycle_game(p=2)
    N, dt = 10, 0.1
    spec = ag.spec_from_model(model, N, dt)
    obj = _lqr_obj(spec, 2, model)
    gc = ag.game_constraints(spec)
    gc = ag.add_collision_avoidance(spec, gc, radius=0.25)
    gc = ag.add_control_bound(spec, gc, u_min=-1.0, u_max=1.0)
    opts_flat = ag.Options(outer_iter=3, inner_iter=6)
    opts_nest = dataclasses.replace(opts_flat, flat_loop=False)
    key = jax.random.PRNGKey(3)
    base = jnp.array([0.0, 1.0, 0.0, 1.0, 0.0, jnp.pi, 0.3, 0.3])
    x0s = base[None] + 0.1 * jax.random.normal(key, (6, spec.n))

    def solve(opts, x0):
        prob = ag.game_problem(N, dt, x0, model, opts, obj, gc)
        return ag.newton_solve(prob)

    rf = jax.jit(jax.vmap(functools.partial(solve, opts_flat)))(x0s)
    rn = jax.jit(jax.vmap(functools.partial(solve, opts_nest)))(x0s)
    np.testing.assert_array_equal(np.asarray(rf.traj.x), np.asarray(rn.traj.x))
    np.testing.assert_array_equal(np.asarray(rf.traj.lam),
                                  np.asarray(rn.traj.lam))
    np.testing.assert_array_equal(np.asarray(rf.stats.iter),
                                  np.asarray(rn.stats.iter))
    for bf, bn in zip(rf.gc.state_blocks + rf.gc.control_blocks,
                      rn.gc.state_blocks + rn.gc.control_blocks):
        np.testing.assert_array_equal(np.asarray(bf.lam), np.asarray(bn.lam))

    # Options.loop_unroll: N iterations per while trip, per-lane select
    # guarding the extra sub-iterations — bitwise identical at any unroll.
    for unroll in (2, 3):
        ru = jax.jit(jax.vmap(functools.partial(
            solve, dataclasses.replace(opts_flat, loop_unroll=unroll))))(x0s)
        np.testing.assert_array_equal(np.asarray(rf.traj.x),
                                      np.asarray(ru.traj.x))
        np.testing.assert_array_equal(np.asarray(rf.traj.lam),
                                      np.asarray(ru.traj.lam))
        np.testing.assert_array_equal(np.asarray(rf.stats.iter),
                                      np.asarray(ru.stats.iter))
        np.testing.assert_array_equal(np.asarray(rf.stats.res),
                                      np.asarray(ru.stats.res))
