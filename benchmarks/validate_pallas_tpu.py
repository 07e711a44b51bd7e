"""On-TPU validation of the fused Pallas KKT sweep (VERDICT r2 #5).

The partial-pivoted block Gaussian elimination in ``ops/thomas_pallas.py``
(both the dense-Q and structured-Q kernels) is stress-tested in f64
interpret mode inside the suite; this script checks it WHERE IT SHIPS —
compiled to the real TPU chip, f32 — against the pivoted Schur path, both at
the KKT-system level across the full AL penalty schedule (mu 1 -> 1e7,
reference ``src/struct/options.jl:56``) and end-to-end through full batched
solves.

Writes ``benchmarks/results/pallas_tpu_validation.json`` (committed artifact).
Run on the chip:  python benchmarks/validate_pallas_tpu.py
"""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

HERE = os.path.dirname(os.path.abspath(__file__))


def kkt_level(spec, model, obj, gc, dtype):
    """Random mid-solve iterates; Pallas vs pivoted Schur on the chip at
    escalating AL penalty curvature (emulates the late-AL Hessian)."""
    import algames_tpu as ag
    from algames_tpu.ops.thomas_pallas import solve_thomas_pallas
    from algames_tpu.problem import residual as R
    from algames_tpu.problem.linear_solver import solve_tridiagonal_schur

    B = 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    trajs = ag.PrimalDual(
        x=0.3 * jax.random.normal(ks[0], (B, spec.N, spec.n), dtype),
        u=0.3 * jax.random.normal(ks[1], (B, spec.T, spec.m), dtype),
        lam=0.3 * jax.random.normal(ks[2], (B, spec.p, spec.T, spec.n),
                                    dtype))
    res, jbs, _, _ = jax.jit(jax.vmap(
        lambda tr: R.assemble(model, spec, obj, gc, tr, 1e-3)))(trajs)
    b = jax.jit(jax.vmap(lambda r: R.residual_knot_blocks(spec, r)))(res)

    from algames_tpu.ops.thomas_pallas import solve_thomas_pallas_structured

    # Structured-Q operands for the SAME iterates (the shipping fast path
    # of every diagonal-objective config): boosting qdiag by mu is exactly
    # the dense sweep's Qblk diagonal boost.
    import dataclasses
    pds = jax.jit(jax.vmap(
        lambda tr: R.point_data(model, spec, obj, gc, tr)))(trajs)
    sqs = jax.jit(jax.vmap(
        lambda tr, pd: R.assemble_structured_from_point(
            spec, obj, gc, tr, pd, 1e-3)[1]))(trajs, pds)
    w_owner = R.structured_w_owner(gc)

    diag = np.arange(spec.n)
    pal = jax.jit(lambda jb, bb: solve_thomas_pallas(spec, jb, bb,
                                                     block_lanes=B))
    pal_sq = jax.jit(lambda sq, bb: solve_thomas_pallas_structured(
        spec, sq, bb, w_owner, block_lanes=B))
    ref = jax.jit(jax.vmap(
        lambda jb, bb: solve_tridiagonal_schur(spec, jb, bb)))

    # f64 host oracle on a lane subset: build the f32 block-tridiagonal
    # system ON DEVICE (so the oracle solves the exact f32-stored system),
    # pull to host, lift to f64, densify, pivoted LAPACK solve.  At mu=1e7
    # the KKT condition number makes kappa*eps_f32 ~ O(1), so BOTH f32
    # solvers carry large absolute error; the meaningful gate is that the
    # pivoting-free Pallas sweep tracks the PIVOTED f32 path's accuracy, not
    # that either matches f64.
    n_oracle = 8
    build = jax.jit(jax.vmap(lambda jb: R.build_tridiagonal(spec, jb)))

    def f64_oracle(DUL, b, lane):
        D, U, L = (np.asarray(a[lane], np.float64) for a in DUL)
        b1 = np.asarray(b[lane], np.float64)
        T, W = spec.T, spec.W
        J = np.zeros((T * W, T * W))
        for t in range(T):
            J[t*W:(t+1)*W, t*W:(t+1)*W] = D[t]
            if t + 1 < T:
                J[t*W:(t+1)*W, (t+1)*W:(t+2)*W] = U[t]
                J[(t+1)*W:(t+2)*W, t*W:(t+1)*W] = L[t]
        return np.linalg.solve(J, b1.reshape(-1))

    rows = []
    for mu in (1.0, 1e2, 1e4, 1e6, 1e7):
        jbs_s = R.JacBlocks(
            Qblk=jbs.Qblk.at[:, :, :, diag, diag].add(dtype(mu)),
            Ublk=jbs.Ublk, A=jbs.A, B=jbs.B) if mu != 1.0 else jbs
        sqs_s = (dataclasses.replace(sqs, qdiag=sqs.qdiag + dtype(mu))
                 if mu != 1.0 else sqs)
        y_pal = np.asarray(pal(jbs_s, b))
        y_sq = np.asarray(pal_sq(sqs_s, b))
        y_ref = np.asarray(ref(jbs_s, b))
        DUL = build(jbs_s)
        err_p = err_s = err_q = 0.0
        for lane in range(n_oracle):
            y64 = f64_oracle(DUL, b, lane)
            scale = max(float(np.max(np.abs(y64))), 1e-30)
            err_p = max(err_p,
                        float(np.max(np.abs(y_pal[lane] - y64))) / scale)
            err_q = max(err_q,
                        float(np.max(np.abs(y_sq[lane] - y64))) / scale)
            err_s = max(err_s,
                        float(np.max(np.abs(y_ref[lane] - y64))) / scale)
        scale = max(float(np.max(np.abs(y_ref))), 1e-30)
        dev = float(np.max(np.abs(y_pal - y_ref))) / scale
        rows.append({"mu": mu, "rel_dev_pallas_vs_schur": dev,
                     "rel_err_pallas_vs_f64": err_p,
                     "rel_err_pallas_structured_vs_f64": err_q,
                     "rel_err_schur_vs_f64": err_s})
        print(f"[kkt] mu={mu:.0e} pal_vs_schur={dev:.3e} "
              f"pal_vs_f64={err_p:.3e} sq_vs_f64={err_q:.3e} "
              f"schur_vs_f64={err_s:.3e}",
              file=sys.stderr)
    return rows


def end_to_end(dtype):
    """Full batched solves on the chip: method=pallas vs method=schur."""
    import algames_tpu as ag
    from algames_tpu.presets import flagship_unicycle

    prob, spec = flagship_unicycle(dtype=dtype, outer=3, inner=8)
    B = 128
    key = jax.random.PRNGKey(1)
    x0s = jnp.tile(prob.x0[None], (B, 1))
    x0s = x0s + 0.05 * jax.random.normal(key, x0s.shape, dtype)

    out = {}
    for method in ("pallas", "schur"):
        q = jax.jit(lambda x, m=method: ag.parallel.solve_batch(
            prob, x, method=m))(x0s)
        jax.block_until_ready(q.traj.x)
        out[method] = q
    dev = float(jnp.max(jnp.abs(out["pallas"].traj.x
                                - out["schur"].traj.x)))
    fr = {m: float(ag.parallel.convergence_fraction(out[m], prob.opts))
          for m in out}
    print(f"[e2e] max_traj_dev={dev:.3e} converged_frac={fr}",
          file=sys.stderr)
    return {"max_traj_dev": dev, "converged_frac": fr,
            "batch": B, "config": "uni3_N20 outer=3 inner=8",
            "note": ("max_traj_dev is the worst lane x knot x dim spread "
                     "between two solvers that each stop anywhere inside "
                     "the f32 eps_opt=1e-2 stationarity basin; per-lane "
                     "convergence is the quality gate.  The deterministic "
                     "single-config f32-vs-f64-oracle match (<1e-3) is "
                     "pinned by tests/test_golden.py")}


def main():
    import algames_tpu as ag
    from algames_tpu.presets import flagship_unicycle

    dtype = jnp.float32
    platform = jax.devices()[0].platform
    prob, spec = flagship_unicycle(dtype=dtype)

    kkt = kkt_level(spec, prob.model, prob.obj, prob.gc, dtype)
    e2e = end_to_end(dtype)

    # Gates (round 4, partial-pivoted kernel — VERDICT r3 #1):
    # * The in-kernel virtual-swap row pivoting holds the sweep at or below
    #   the PIVOTED schur path's error across the ENTIRE AL penalty schedule
    #   (round-3's pivoting-free Gauss-Jordan lost ~0.1 relative at mu=1e7;
    #   the pivoted kernel measures ~1e-4 there vs schur's ~5e-3, because
    #   the kernel's f32 VPU arithmetic also beats the XLA path's default
    #   TPU matmul precision at low mu).
    for r in kkt:
        for k in ("rel_err_pallas_vs_f64", "rel_err_pallas_structured_vs_f64"):
            assert r[k] <= max(2.0 * r["rel_err_schur_vs_f64"], 1e-4), r
            assert r[k] <= 1e-2, r
    # e2e: both methods must fully converge at the standard gates; the
    # trajectory spread stays within the shared eps_opt=1e-2 basin
    # (measured 1.5e-2 over 128 lanes; see note above).
    assert all(v == 1.0 for v in e2e["converged_frac"].values()), e2e
    assert e2e["max_traj_dev"] < 5e-2, e2e

    result = {"platform": platform, "dtype": "float32",
              "kkt_penalty_sweep": kkt, "end_to_end": e2e}
    os.makedirs(os.path.join(HERE, "results"), exist_ok=True)
    path = os.path.join(HERE, "results", "pallas_tpu_validation.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"metric": "pallas_tpu_validation",
                      "platform": platform,
                      "worst_kkt_rel_err_vs_f64": max(
                          r["rel_err_pallas_vs_f64"] for r in kkt),
                      "e2e_max_traj_dev": e2e["max_traj_dev"]}))


if __name__ == "__main__":
    main()
