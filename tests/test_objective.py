"""Objective expansion oracles (mirrors reference test/objective/objective.jl)."""
import jax
import jax.numpy as jnp
import numpy as np

import algames_tpu as ag
from algames_tpu.objective.objective import (_pair_grad_hess, cost_gradient,
                                             cost_hessian, expand_vector)


def test_expand_vector():
    # reference test/objective/objective.jl:4-8 (0-based indices)
    v = jnp.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(expand_vector(v, (0, 2, 4), 5),
                               [1.0, 0.0, 2.0, 0.0, 3.0])


def _setup(p=3, N=10, dt=0.1):
    model = ag.unicycle_game(p=p)
    spec = ag.spec_from_model(model, N, dt)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    Q = [jax.random.uniform(ks[0], (4,), jnp.float64) + 0.1 for _ in range(p)]
    R = [jax.random.uniform(ks[1], (2,), jnp.float64) + 0.1 for _ in range(p)]
    xf = [float(i + 1) * jnp.ones(4) for i in range(p)]
    uf = [2.0 * (i + 1) * jnp.ones(2) for i in range(p)]
    obj = ag.game_objective(spec, Q, R, xf, uf, dtype=jnp.float64)
    traj = ag.PrimalDual(
        x=10 * jax.random.uniform(ks[2], (N, spec.n), jnp.float64),
        u=10 * jax.random.uniform(ks[3], (N - 1, spec.m), jnp.float64),
        lam=jnp.zeros((p, N - 1, spec.n)))
    return spec, obj, traj, Q, R, xf, uf


def test_lqr_gradient_dt_and_terminal():
    """Stage gradient = Q(x - xf) * dt; terminal without dt; terminal r = 0
    (reference test/objective/objective.jl:50-63)."""
    spec, obj, traj, Q, R, xf, uf = _setup()
    dt = spec.dt
    qx, ru = cost_gradient(spec, obj, traj)
    i = 0
    Qfull = np.zeros(spec.n)
    Qfull[np.asarray(spec.pz[i])] = np.asarray(Q[i])
    xful = np.zeros(spec.n)
    xful[np.asarray(spec.pz[i])] = np.asarray(xf[i])
    np.testing.assert_allclose(qx[i, 0], Qfull * (np.asarray(traj.x[0]) - xful) * dt,
                               rtol=1e-12)
    np.testing.assert_allclose(qx[i, -1], Qfull * (np.asarray(traj.x[-1]) - xful),
                               rtol=1e-12)
    Rfull = np.zeros(spec.m)
    Rfull[np.asarray(spec.pu[i])] = np.asarray(R[i])
    uful = np.zeros(spec.m)
    uful[np.asarray(spec.pu[i])] = np.asarray(uf[i])
    np.testing.assert_allclose(ru[i, 0], Rfull * (np.asarray(traj.u[0]) - uful) * dt,
                               rtol=1e-12)


def test_lqr_hessian_dt_and_terminal():
    spec, obj, traj, Q, R, xf, uf = _setup()
    Qx, Ru = cost_hessian(spec, obj, traj)
    i = 1
    Qfull = np.zeros(spec.n)
    Qfull[np.asarray(spec.pz[i])] = np.asarray(Q[i])
    np.testing.assert_allclose(Qx[i, 0], np.diag(Qfull) * spec.dt, rtol=1e-12)
    np.testing.assert_allclose(Qx[i, -1], np.diag(Qfull), rtol=1e-12)
    Rfull = np.zeros(spec.m)
    Rfull[np.asarray(spec.pu[i])] = np.asarray(R[i])
    np.testing.assert_allclose(Ru[i, 0], np.diag(Rfull) * spec.dt, rtol=1e-12)


def test_collision_cost_gradient_vs_autodiff():
    """Collision gradient matches autodiff of 0.5 mu max(0, r - |d|)^2 when
    active (reference test/objective/objective.jl:150-171)."""
    p = 2
    model = ag.double_integrator_game(p=p)
    spec = ag.spec_from_model(model, 4, 0.1)
    obj = ag.game_objective(spec, Q=[jnp.ones(4)] * p, R=[jnp.ones(2)] * p,
                            xf=[jnp.zeros(4)] * p, uf=[jnp.zeros(2)] * p,
                            dtype=jnp.float64)
    mu, r_active = 10.0, 1e3
    obj_a = ag.add_collision_cost(spec, obj, radius=jnp.array([r_active, r_active]),
                                  mu=jnp.array([mu, mu]))
    x = jax.random.normal(jax.random.PRNGKey(3), (spec.n,), jnp.float64)

    def stage_cost(xx, idx):
        pxi = np.asarray(obj_a.pxi[idx])
        pxj = np.asarray(obj_a.pxj[idx])
        dn = jnp.linalg.norm(xx[pxi] - xx[pxj])
        return 0.5 * obj_a.mu[idx] * jnp.maximum(0.0, obj_a.r[idx] - dn) ** 2

    grads, hesss = _pair_grad_hess(obj_a, x[None], spec.n, want_hess=True)
    g_ad = jax.grad(stage_cost)(x, 0)
    np.testing.assert_allclose(grads[0, 0], g_ad, rtol=1e-6, atol=1e-8)
    h_ad = jax.hessian(stage_cost)(x, 0)
    np.testing.assert_allclose(hesss[0, 0], h_ad, rtol=1e-5, atol=1e-2)
    # inactive pair contributes nothing
    obj_i = ag.add_collision_cost(spec, obj, radius=jnp.array([1e-3, 1e-3]),
                                  mu=jnp.array([mu, mu]))
    grads_i, _ = _pair_grad_hess(obj_i, x[None], spec.n, want_hess=False)
    np.testing.assert_allclose(grads_i, 0.0)


def test_total_cost_zero_at_target():
    p = 2
    model = ag.unicycle_game(p=p)
    spec = ag.spec_from_model(model, 5, 0.1)
    xf = [jnp.array([1.0, 2.0, 0.0, 0.5])] * p
    uf = [jnp.zeros(2)] * p
    obj = ag.game_objective(spec, [jnp.ones(4)] * p, [jnp.ones(2)] * p, xf, uf,
                            dtype=jnp.float64)
    xful = np.zeros(spec.n)
    for i in range(p):
        xful[np.asarray(spec.pz[i])] = np.asarray(xf[i])
    traj = ag.PrimalDual(x=jnp.tile(jnp.asarray(xful), (spec.N, 1)),
                         u=jnp.zeros((spec.T, spec.m)),
                         lam=jnp.zeros((p, spec.T, spec.n)))
    assert abs(float(ag.total_cost(spec, obj, traj, 0))) < 1e-12
