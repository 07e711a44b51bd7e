"""MPC receding-horizon loop with warm starts."""
import jax.numpy as jnp
import numpy as np

import algames_tpu as ag
from algames_tpu.mpc import mpc_solve


def test_mpc_tracks_target():
    p = 2
    model = ag.double_integrator_game(p=p)
    N, dt = 10, 0.1
    spec = ag.spec_from_model(model, N, dt)
    xf = [jnp.array([1.0, 1.0, 0.0, 0.0]), jnp.array([-1.0, -1.0, 0.0, 0.0])]
    obj = ag.game_objective(spec, [10.0 * jnp.ones(4)] * p,
                            [0.1 * jnp.ones(2)] * p,
                            xf, [jnp.zeros(2)] * p, dtype=jnp.float64)
    gc = ag.game_constraints(spec)
    opts = ag.Options(outer_iter=1, inner_iter=3, reg_0=1e-7, shift=1,
                      mpc_horizon=12, upsampling=2)
    x0 = jnp.zeros(8)
    prob = ag.game_problem(N, dt, x0, model, opts, obj, gc)
    out = mpc_solve(prob, horizon=12)
    assert out.states.shape == (13, 8)
    assert out.controls.shape == (12, 4)
    # Players converge toward their targets under closed-loop MPC.
    xT = np.asarray(out.states[-1])
    tgt = np.zeros(8)
    for i in range(p):
        tgt[np.asarray(spec.pz[i])] = np.asarray(xf[i])
    start_err = np.linalg.norm(np.asarray(x0) - tgt)
    end_err = np.linalg.norm(xT - tgt)
    assert end_err < 0.5 * start_err
    assert np.all(np.isfinite(np.asarray(out.dyn_vio)))


def test_mpc_warm_start_helps():
    """Warm-started replans need no more iterations than the cold solve."""
    p = 2
    model = ag.unicycle_game(p=p)
    N, dt = 10, 0.1
    spec = ag.spec_from_model(model, N, dt)
    obj = ag.game_objective(spec, [jnp.ones(4)] * p, [0.5 * jnp.ones(2)] * p,
                            [jnp.zeros(4)] * p, [jnp.zeros(2)] * p,
                            dtype=jnp.float64)
    gc = ag.game_constraints(spec)
    opts = ag.Options(outer_iter=2, inner_iter=8, reg_0=1e-7, shift=1)
    x0 = jnp.array([1.0, 2.0, 1.0, 2.0, 0.0, 0.0, 0.5, 0.5])
    prob = ag.game_problem(N, dt, x0, model, opts, obj, gc)
    out = mpc_solve(prob, horizon=5)
    iters = np.asarray(out.iters)
    assert np.all(iters[1:] <= iters[0] + 1)
