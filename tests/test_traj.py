"""PrimalDual trajectory tests (mirrors reference test/struct/primal_dual_traj.jl)."""
import jax
import jax.numpy as jnp
import numpy as np

import algames_tpu as ag
from algames_tpu.core.traj import (delta_step, init_traj, pack_traj,
                                   unpack_step, update_traj, zero_traj)


def _spec():
    return ag.spec_from_model(ag.unicycle_game(p=2), N=6, dt=0.1)


def test_pack_unpack_roundtrip():
    spec = _spec()
    key = jax.random.PRNGKey(0)
    flat = jax.random.normal(key, (spec.S,), jnp.float64)
    traj = unpack_step(spec, flat)
    assert traj.x.shape == (spec.N, spec.n)
    assert traj.u.shape == (spec.T, spec.m)
    assert traj.lam.shape == (spec.p, spec.T, spec.n)
    np.testing.assert_allclose(traj.x[0], 0.0)       # knot-1 state not a variable
    np.testing.assert_allclose(pack_traj(spec, traj), flat)


def test_init_traj_shift_semantics():
    """init_traj! shift: entry k <- prev[k+s] when in range, else fresh
    (reference src/struct/primal_dual_traj.jl:29-44)."""
    spec = _spec()
    x0 = jnp.arange(spec.n, dtype=jnp.float64)
    prev = ag.PrimalDual(
        x=jnp.arange(spec.N * spec.n, dtype=jnp.float64).reshape(spec.N, spec.n),
        u=jnp.arange(spec.T * spec.m, dtype=jnp.float64).reshape(spec.T, spec.m),
        lam=jnp.ones((spec.p, spec.T, spec.n), jnp.float64))
    out = init_traj(spec, x0, shift=2, prev=prev)
    np.testing.assert_allclose(out.x[0], x0)
    np.testing.assert_allclose(out.x[1], prev.x[3])
    np.testing.assert_allclose(out.u[0], prev.u[2])
    np.testing.assert_allclose(out.lam[:, 0], prev.lam[:, 2])
    # out-of-range entries redrawn at amplitude (zero without a key)
    np.testing.assert_allclose(out.u[-1], 0.0)
    # default huge shift -> everything fresh except x0
    fresh = init_traj(spec, x0)
    np.testing.assert_allclose(fresh.x[1:], 0.0)


def test_update_and_delta_step():
    spec = _spec()
    t0 = zero_traj(spec, jnp.float64)
    delta = ag.PrimalDual(
        x=jnp.ones((spec.N, spec.n)).at[0].set(0.0),
        u=2 * jnp.ones((spec.T, spec.m)),
        lam=3 * jnp.ones((spec.p, spec.T, spec.n)))
    out = update_traj(t0, 0.5, delta)
    np.testing.assert_allclose(out.x[1:], 0.5)
    np.testing.assert_allclose(out.u, 1.0)
    np.testing.assert_allclose(out.lam, 1.5)
    # delta_step: (sum |x_{k+1}| + sum |u|) * alpha / ((N-1)(n+m)),
    # duals excluded (reference primal_dual_traj.jl:130-147)
    T, n, m = spec.T, spec.n, spec.m
    expect = (T * n * 1.0 + T * m * 2.0) * 0.5 / (T * (n + m))
    np.testing.assert_allclose(float(delta_step(delta, 0.5)), expect)


def test_reset_duals():
    spec = _spec()
    traj = ag.PrimalDual(x=jnp.ones((spec.N, spec.n)),
                         u=jnp.ones((spec.T, spec.m)),
                         lam=jnp.ones((spec.p, spec.T, spec.n)))
    out = ag.reset_duals(traj)
    np.testing.assert_allclose(out.lam, 0.0)
    np.testing.assert_allclose(out.x, 1.0)
