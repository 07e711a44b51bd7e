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


def test_solve_many_matches_solve_batch():
    """On-device chunked sweep == one-shot vmap, lane for lane, including a
    ragged tail (N not divisible by chunk) and the keys path."""
    from algames_tpu.parallel import solve_many
    prob = _prob()
    N = 7
    x0s = jnp.tile(prob.x0[None], (N, 1))
    x0s = x0s + 0.02 * jax.random.normal(jax.random.PRNGKey(3),
                                         x0s.shape, jnp.float64)
    ref = solve_batch(prob, x0s)
    for chunk, unroll in ((3, 1), (4, 1), (4, 2), (16, 1), (None, 1)):
        out = jax.jit(lambda x, c=chunk, u=unroll: solve_many(
            prob, x, chunk=c, unroll=u))(x0s)
        np.testing.assert_array_equal(np.asarray(out.traj.x),
                                      np.asarray(ref.traj.x))
        np.testing.assert_array_equal(np.asarray(out.stats.iter),
                                      np.asarray(ref.stats.iter))
    # Per-chunk on-device reduction: [C, ...] outputs, no materialized
    # SolveResults; values match the full-output path chunk for chunk.
    red = jax.jit(lambda x: solve_many(
        prob, x, chunk=4,
        reduce=lambda r: (r.traj.x, jnp.max(r.stats.iter))))(x0s)
    np.testing.assert_array_equal(
        np.asarray(red[0]).reshape(-1, *ref.traj.x.shape[1:])[:N],
        np.asarray(ref.traj.x))
    assert red[1].shape == (2,)
    assert int(jnp.max(red[1])) == int(jnp.max(ref.stats.iter))

    keys = jax.random.split(jax.random.PRNGKey(5), N)
    ref_k = solve_batch(prob, x0s, keys=keys)
    out_k = solve_many(prob, x0s, keys=keys, chunk=4)
    # With the 1e-8 random init, CPU fusion reassociates differently per
    # batch shape — equal to the one-shot vmap within roundoff.
    np.testing.assert_allclose(np.asarray(out_k.traj.x),
                               np.asarray(ref_k.traj.x), atol=1e-12)


def test_mesh_shapes_and_scaling_invariance():
    """Weak-scaling correctness: the same scenarios solved on a 1-, 2-, 4-,
    and 8-device mesh produce identical trajectories and summary stats —
    the collective reductions are size-invariant.  (Throughput scaling is a
    hardware property measured on real slices; here we pin down that the
    sharded program is correct at every mesh size.)"""
    prob = _prob()
    batch = 8
    x0s = jnp.tile(prob.x0[None], (batch, 1))
    x0s = x0s + 0.01 * jax.random.normal(jax.random.PRNGKey(1),
                                         x0s.shape, jnp.float64)
    ref = None
    for nd in (1, 2, 4, 8):
        mesh = make_mesh(nd)
        assert mesh.devices.size == nd
        trajs, summary = jax.jit(
            lambda x, m=mesh: sharded_monte_carlo(prob, m, x))(x0s)
        if ref is None:
            ref = (np.asarray(trajs), float(summary["converged_frac"]))
        else:
            np.testing.assert_allclose(np.asarray(trajs), ref[0],
                                       rtol=1e-10, atol=1e-10)
            assert float(summary["converged_frac"]) == ref[1]


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
