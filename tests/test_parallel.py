"""Batched + sharded Monte-Carlo solving on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

import algames_tpu as ag
from algames_tpu.parallel import (convergence_fraction, make_mesh,
                                  sharded_monte_carlo, solve_batch)


def _prob(p=2, N=6):
    model = ag.unicycle_game(p=p)
    dt = 0.1
    spec = ag.spec_from_model(model, N, dt)
    obj = ag.game_objective(spec, [jnp.ones(4)] * p, [0.5 * jnp.ones(2)] * p,
                            [jnp.zeros(4)] * p, [jnp.zeros(2)] * p,
                            dtype=jnp.float64)
    gc = ag.game_constraints(spec)
    opts = ag.Options(outer_iter=2, inner_iter=5, reg_0=1e-7)
    x0 = jnp.array([1.0, 2.0, 1.0, 2.0, 0.0, 0.0, 0.5, 0.5])
    return ag.game_problem(N, dt, x0, model, opts, obj, gc)


def test_solve_batch_matches_loop():
    prob = _prob()
    x0s = jnp.stack([prob.x0 * (1 + 0.1 * i) for i in range(4)])
    out = solve_batch(prob, x0s)
    for b in range(4):
        pb = ag.GameProblem(spec=prob.spec, model=prob.model, opts=prob.opts,
                            x0=x0s[b], obj=prob.obj, gc=prob.gc)
        single = ag.newton_solve(pb)
        np.testing.assert_allclose(np.asarray(out.traj.x[b]),
                                   np.asarray(single.traj.x), atol=1e-12)
    frac = convergence_fraction(out, prob.opts)
    assert 0.0 <= float(frac) <= 1.0


def test_sharded_monte_carlo_8_devices():
    assert jax.device_count() == 8, "conftest must provide 8 virtual devices"
    prob = _prob()
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    batch = 16
    x0s = jnp.tile(prob.x0[None], (batch, 1))
    x0s = x0s + 0.01 * jax.random.normal(jax.random.PRNGKey(0),
                                         x0s.shape, jnp.float64)
    trajs, summary = jax.jit(
        lambda x: sharded_monte_carlo(prob, mesh, x))(x0s)
    assert trajs.shape == (batch, prob.spec.N, prob.spec.n)
    assert np.isfinite(float(summary["worst_dyn_vio"]))
    # Sharded result matches the unsharded vmap lane-for-lane.
    ref = solve_batch(prob, x0s)
    np.testing.assert_allclose(np.asarray(trajs), np.asarray(ref.traj.x),
                               rtol=1e-10, atol=1e-10)
