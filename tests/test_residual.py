"""Residual/Jacobian assembly oracles.

The sharpest check: for problem classes where the reference's quasi-Newton
Jacobian is the *exact* derivative of the residual (linear dynamics OR zero
multipliers, plus constant-Jacobian constraints), our assembled flat Jacobian
must equal ``jax.jacfwd`` of the flat residual — this validates every index
in the layout at once.  Plus an independent literal-numpy reimplementation of
the reference assembly loops (``global_quantities.jl``) on a random problem.
"""
import jax
import jax.numpy as jnp
import numpy as np

import algames_tpu as ag
from algames_tpu.core.traj import pack_traj, unpack_step
from algames_tpu.models.integration import rk2_step
from algames_tpu.problem import residual as R


def _random_traj(spec, key, lam_scale=1.0):
    k1, k2, k3 = jax.random.split(key, 3)
    return ag.PrimalDual(
        x=jax.random.normal(k1, (spec.N, spec.n), jnp.float64),
        u=jax.random.normal(k2, (spec.T, spec.m), jnp.float64),
        lam=lam_scale * jax.random.normal(k3, (spec.p, spec.T, spec.n), jnp.float64))


def _flat_residual_fn(model, spec, obj, gc, x0):
    def f(v):
        tr = unpack_step(spec, v)
        tr = ag.PrimalDual(x=tr.x.at[0].set(x0), u=tr.u, lam=tr.lam)
        res = R.residual(model, spec, obj, gc, tr)
        return R.flatten_residual(spec, res)
    return f


def test_jacobian_equals_autodiff_linear_dynamics():
    """DI dynamics (A,B constant) + control bounds + zero duals on the
    collision pair: quasi-Newton == exact derivative."""
    p = 2
    model = ag.double_integrator_game(p=p)
    spec = ag.spec_from_model(model, 5, 0.1)
    obj = ag.game_objective(spec, [jnp.ones(4) + 0.3] * p, [0.5 * jnp.ones(2)] * p,
                            [jnp.ones(4)] * p, [jnp.zeros(2)] * p,
                            dtype=jnp.float64)
    gc = ag.game_constraints(spec)
    gc = ag.add_control_bound(spec, gc, 0.2 * jnp.ones(spec.m),
                              -0.2 * jnp.ones(spec.m))
    traj = _random_traj(spec, jax.random.PRNGKey(0))
    x0 = traj.x[0]

    f = _flat_residual_fn(model, spec, obj, gc, x0)
    v = pack_traj(spec, traj)
    J_ad = jax.jacfwd(f)(v)

    # Reorder AD rows (reference vertical order) is already produced by f;
    # columns are the packed (horizontal) order. Our assembled Jacobian:
    jb = R.jacobian_blocks(model, spec, obj, gc, traj)
    J_as = R.flatten_jacobian(spec, jb)
    np.testing.assert_allclose(np.asarray(J_as), np.asarray(J_ad),
                               rtol=1e-10, atol=1e-10)


def test_jacobian_equals_autodiff_nonlinear_zero_duals():
    """Unicycle (nonlinear) with zero multipliers: the dropped d(A'lam)/dx
    terms vanish, so quasi-Newton == exact again."""
    p = 2
    model = ag.unicycle_game(p=p)
    spec = ag.spec_from_model(model, 4, 0.1)
    obj = ag.game_objective(spec, [jnp.ones(4)] * p, [jnp.ones(2)] * p,
                            [jnp.zeros(4)] * p, [jnp.zeros(2)] * p,
                            dtype=jnp.float64)
    gc = ag.game_constraints(spec)
    traj = _random_traj(spec, jax.random.PRNGKey(1), lam_scale=0.0)
    f = _flat_residual_fn(model, spec, obj, gc, traj.x[0])
    J_ad = jax.jacfwd(f)(pack_traj(spec, traj))
    jb = R.jacobian_blocks(model, spec, obj, gc, traj)
    J_as = R.flatten_jacobian(spec, jb)
    np.testing.assert_allclose(np.asarray(J_as), np.asarray(J_ad),
                               rtol=1e-9, atol=1e-9)


def test_dense_matches_tridiagonal_layout():
    """The (D, U, L) block-tridiagonal packing and the reference-order flat
    Jacobian contain the same matrix up to the known row/col permutation."""
    p = 2
    model = ag.unicycle_game(p=p)
    spec = ag.spec_from_model(model, 5, 0.1)
    obj = ag.game_objective(spec, [jnp.ones(4)] * p, [jnp.ones(2)] * p,
                            [jnp.zeros(4)] * p, [jnp.zeros(2)] * p,
                            dtype=jnp.float64)
    gc = ag.game_constraints(spec)
    traj = _random_traj(spec, jax.random.PRNGKey(2))
    jb = R.jacobian_blocks(model, spec, obj, gc, traj, reg_x=0.17, reg_u=0.03)
    D, U, L = R.build_tridiagonal(spec, jb)
    J_ref = np.asarray(R.flatten_jacobian(spec, jb))

    # Build row permutation: knot-order row r -> reference-order row.
    T, n, m, W, pnum = spec.T, spec.n, spec.m, spec.W, spec.p
    mi = spec.mi[0]
    perm = np.zeros(spec.S, dtype=int)
    for t in range(T):
        for i in range(pnum):
            perm[t * W + i * n: t * W + (i + 1) * n] = np.arange(
                spec.row_stat_x(i, t), spec.row_stat_x(i, t) + n)
        for i in range(pnum):
            pu = np.asarray(spec.pu[i])
            perm[t * W + pnum * n + pu] = np.arange(
                spec.row_stat_u(i, t), spec.row_stat_u(i, t) + mi)
        perm[t * W + pnum * n + m: t * W + W] = np.arange(
            spec.row_dyn(t), spec.row_dyn(t) + n)

    J_knot = np.zeros((spec.S, spec.S))
    for t in range(T):
        J_knot[t * W:(t + 1) * W, t * W:(t + 1) * W] = np.asarray(D[t])
        if t + 1 < T:
            J_knot[t * W:(t + 1) * W, (t + 1) * W:(t + 2) * W] = np.asarray(U[t])
            J_knot[(t + 1) * W:(t + 2) * W, t * W:(t + 1) * W] = np.asarray(L[t])
    np.testing.assert_allclose(J_knot, J_ref[perm, :], atol=1e-12)

    # Residual flattenings agree under the same permutation.
    res = R.residual(model, spec, obj, gc, traj)
    b_knot = np.asarray(R.residual_knot_blocks(spec, res)).reshape(-1)
    b_ref = np.asarray(R.flatten_residual(spec, res))
    np.testing.assert_allclose(b_knot, b_ref[perm], atol=1e-14)


def test_residual_against_literal_numpy():
    """Independent literal reimplementation of the reference residual loops
    (``global_quantities.jl:9-66``) in numpy for a 2-player DI game."""
    p = 2
    model = ag.double_integrator_game(p=p)
    N, dt = 4, 0.1
    spec = ag.spec_from_model(model, N, dt)
    Q = [np.array([1.0, 2.0, 3.0, 4.0]), np.array([2.0, 1.0, 0.5, 0.25])]
    Rm = [np.array([0.5, 0.6]), np.array([0.7, 0.8])]
    xf = [np.array([1.0, 0.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0, 0.0])]
    uf = [np.zeros(2), np.zeros(2)]
    obj = ag.game_objective(spec, Q, Rm, xf, uf, dtype=jnp.float64)
    gc = ag.game_constraints(spec)
    traj = _random_traj(spec, jax.random.PRNGKey(7))
    res = R.residual(model, spec, obj, gc, traj)
    flat = np.asarray(R.flatten_residual(spec, res))

    # --- literal numpy re-derivation -----------------------------------
    n, m = spec.n, spec.m
    X = np.asarray(traj.x)
    Um = np.asarray(traj.u)
    lam = np.asarray(traj.lam)
    Qfull = np.zeros((p, n))
    Rfull = np.zeros((p, m))
    xffull = np.zeros((p, n))
    for i in range(p):
        Qfull[i, np.asarray(spec.pz[i])] = Q[i]
        Rfull[i, np.asarray(spec.pu[i])] = Rm[i]
        xffull[i, np.asarray(spec.pz[i])] = xf[i]

    def fdyn(x, u):
        return np.concatenate([x[m:], u])

    def rk2(x, u):
        k1 = fdyn(x, u) * dt
        k2 = fdyn(x + k1 / 2, u) * dt
        return x + k2

    # DI RK2 jacobians (analytic): A = I + dt*Ac + dt^2/2 Ac^2, etc.
    eps = 1e-7
    def jac(x, u):
        A = np.zeros((n, n))
        B = np.zeros((n, m))
        for j in range(n):
            d = np.zeros(n); d[j] = eps
            A[:, j] = (rk2(x + d, u) - rk2(x - d, u)) / (2 * eps)
        for j in range(m):
            d = np.zeros(m); d[j] = eps
            B[:, j] = (rk2(x, u + d) - rk2(x, u - d)) / (2 * eps)
        return A, B

    expect = np.zeros(spec.S)
    for i in range(p):
        for t in range(spec.T):
            scale = dt if (t + 1) < (N - 1) else 1.0  # terminal knot N-1 (0-based)
            q = Qfull[i] * (X[t + 1] - xffull[i]) * scale
            r0 = spec.row_stat_x(i, t)
            expect[r0:r0 + n] += q
            pu = np.asarray(spec.pu[i])
            ru_ = Rfull[i][pu] * Um[t][pu] * dt
            r0 = spec.row_stat_u(i, t)
            expect[r0:r0 + len(pu)] += ru_
    for t in range(spec.T):
        A, B = jac(X[t], Um[t])
        for i in range(p):
            pu = np.asarray(spec.pu[i])
            if t >= 1:
                r0 = spec.row_stat_x(i, t - 1)
                expect[r0:r0 + n] += A.T @ lam[i, t]
            r0 = spec.row_stat_u(i, t)
            expect[r0:r0 + len(pu)] += B[:, pu].T @ lam[i, t]
            r0 = spec.row_stat_x(i, t)
            expect[r0:r0 + n] += -lam[i, t]
        r0 = spec.row_dyn(t)
        expect[r0:r0 + n] += rk2(X[t], Um[t]) - X[t + 1]
    np.testing.assert_allclose(flat, expect, rtol=1e-7, atol=1e-7)


def test_residual_norm_and_violations():
    p = 1
    model = ag.double_integrator_game(p=p)
    spec = ag.spec_from_model(model, 3, 0.1)
    res = R.Residual(rx=jnp.ones((2, 1, 4)), ru=2 * jnp.ones((2, 2)),
                     rd=-3 * jnp.ones((2, 4)))
    total = 8 * 1.0 + 4 * 2.0 + 8 * 3.0
    np.testing.assert_allclose(float(R.residual_norm(spec, res)), total / spec.S)
    np.testing.assert_allclose(float(R.optimality_violation(res)), 2.0)
    np.testing.assert_allclose(float(R.dynamics_violation(res)), 3.0)
