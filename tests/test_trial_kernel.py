"""Hand-written lane-last trial kernel (``ops/trial_kernel.py``).

Interpret-mode equivalence against the XLA trial pass on the flagship
structure (unicycle + pairwise collision + control bounds + diagonal LQR),
plus the full-solve ``Options.ls_fused`` path and the supported-structure
predicate.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import algames_tpu as ag
from algames_tpu.core.traj import PrimalDual, init_traj, update_traj
from algames_tpu.models.integration import rollout_rk3
from algames_tpu.ops.trial_kernel import (handwritten_supported,
                                          handwritten_trial_for_problem)
from algames_tpu.problem import residual as R


def _setup(p=3, N=20):
    model = ag.unicycle_game(p=p)
    spec = ag.spec_from_model(model, N, 0.1)
    obj = ag.game_objective(
        spec, Q=[jnp.ones(4)] * p, R=[0.1 * jnp.ones(2)] * p,
        xf=[jnp.array([2.0, i * 0.4, 0.0, 0.3]) for i in range(p)],
        uf=[jnp.zeros(2)] * p)
    gc = ag.game_constraints(spec)
    gc = ag.add_collision_avoidance(spec, gc, 0.08)
    gc = ag.add_control_bound(spec, gc, 2 * jnp.ones(2 * p),
                              -2 * jnp.ones(2 * p))
    x0 = jnp.zeros(spec.n).at[np.arange(p) + p].set(0.4 * np.arange(p)) \
        .at[np.arange(p) + 3 * p].set(0.5)
    return model, spec, obj, gc, x0


def _xla_trial(model, spec, obj, gc, traj, dtraj, alpha, reg_eff):
    trial = update_traj(traj, alpha, dtraj)
    lite, res_t = R.point_lite_res(model, spec, obj, gc, trial)
    rx = res_t.rx + (reg_eff * alpha) * dtraj.x[1:][:, None, :]
    ru = res_t.ru + (reg_eff * alpha) * dtraj.u
    tn = R.residual_norm(spec, R.Residual(rx=rx, ru=ru, rd=res_t.rd))
    return tn, lite


def test_supported_predicate():
    model, spec, obj, gc, _ = _setup()
    assert handwritten_supported(model, spec, obj, gc)
    # Bicycle model: outside the specialization.
    bike = ag.bicycle_game(p=2)
    bspec = ag.spec_from_model(bike, 10, 0.1)
    bobj = ag.game_objective(bspec, Q=[jnp.ones(4)] * 2,
                             R=[jnp.ones(2)] * 2, xf=[jnp.zeros(4)] * 2,
                             uf=[jnp.zeros(2)] * 2)
    bgc = ag.game_constraints(bspec)
    assert handwritten_trial_for_problem(bike, bspec, bobj, bgc) is None
    # Circle constraints: outside the specialization.
    gc_c = ag.add_circle_constraint(spec, gc, jnp.asarray([1.0]),
                                    jnp.asarray([0.0]), jnp.asarray([0.2]))
    assert not handwritten_supported(model, spec, obj, gc_c)


def test_kernel_matches_xla_trial():
    model, spec, obj, gc, x0 = _setup()
    traj = init_traj(spec, x0)
    traj = PrimalDual(x=rollout_rk3(model, x0, traj.u, spec.dt), u=traj.u,
                      lam=0.1 * jnp.ones((spec.p, spec.T, spec.n)))
    dtraj = jax.tree_util.tree_map(lambda a: 0.01 * jnp.ones_like(a), traj)
    alpha, reg = jnp.asarray(0.5), jnp.asarray(1e-3)

    trial_fn = handwritten_trial_for_problem(model, spec, obj, gc,
                                             interpret=True)
    assert trial_fn is not None
    tn_k, lite_k = jax.jit(trial_fn)(traj, dtraj, alpha, reg, gc, obj)
    tn_r, lite_r = jax.jit(
        lambda *a: _xla_trial(model, spec, obj, gc, *a))(traj, dtraj,
                                                         alpha, reg)
    np.testing.assert_allclose(float(tn_k), float(tn_r), rtol=1e-13)
    for a, b in zip(jax.tree_util.tree_leaves(lite_k),
                    jax.tree_util.tree_leaves(lite_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                                   atol=1e-13)

    # Batched through the custom_vmap rule.
    x0s = x0[None] + 0.05 * jax.random.normal(jax.random.PRNGKey(0),
                                              (4, spec.n))
    trajs = jax.vmap(lambda x: PrimalDual(
        x=rollout_rk3(model, x, traj.u, spec.dt), u=traj.u,
        lam=traj.lam))(x0s)
    dtrajs = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (4,) + a.shape), dtraj)
    alphas, regs = jnp.full((4,), 0.5), jnp.full((4,), 1e-3)
    tn_b, lite_b = jax.jit(jax.vmap(
        lambda t, d, a, r: trial_fn(t, d, a, r, gc, obj)))(
            trajs, dtrajs, alphas, regs)
    tn_br, lite_br = jax.jit(jax.vmap(
        lambda t, d, a, r: _xla_trial(model, spec, obj, gc, t, d, a, r)))(
            trajs, dtrajs, alphas, regs)
    np.testing.assert_allclose(np.asarray(tn_b), np.asarray(tn_br),
                               rtol=1e-13)
    np.testing.assert_allclose(np.asarray(lite_b.rx0),
                               np.asarray(lite_br.rx0), rtol=0, atol=1e-13)
    np.testing.assert_allclose(np.asarray(lite_b.ru0),
                               np.asarray(lite_br.ru0), rtol=0, atol=1e-13)


def test_full_solve_ls_fused_handwritten():
    model, spec, obj, gc, x0 = _setup(p=2, N=10)
    prob = ag.game_problem(10, 0.1, x0, model,
                           ag.Options(outer_iter=3, inner_iter=6), obj, gc)
    prob_f = dataclasses.replace(
        prob, opts=dataclasses.replace(prob.opts, ls_fused=True))
    x0s = x0[None] + 0.05 * jax.random.normal(jax.random.PRNGKey(0),
                                              (4, spec.n))
    out_r = jax.jit(lambda x: ag.parallel.solve_batch(
        prob, x, method="pallas_interpret"))(x0s)
    out_f = jax.jit(lambda x: ag.parallel.solve_batch(
        prob_f, x, method="pallas_interpret"))(x0s)
    np.testing.assert_array_equal(np.asarray(out_r.stats.iter),
                                  np.asarray(out_f.stats.iter))
    np.testing.assert_allclose(np.asarray(out_r.traj.x),
                               np.asarray(out_f.traj.x), rtol=0, atol=1e-10)
