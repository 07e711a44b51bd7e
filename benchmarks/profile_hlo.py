"""Device-time breakdown of the headline bench via xprof hlo_stats.

Traces the steady-state bench hot loop (batched pallas-method solves) with
``jax.profiler`` and converts the raw trace to the XProf ``hlo_stats`` table,
printing the top ops by device self-time — the ground truth for where the
6-ish ms of per-chunk device time goes (standalone-jit phase timings are
useless under the ~25 ms axon-tunnel dispatch RPC; see CLAUDE.md).

Usage: python benchmarks/profile_hlo.py [--chunks 8] [--top 40]
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--method", default="pallas")
    ap.add_argument("--logdir", default="/tmp/algames_xprof")
    ap.add_argument("--json", default=None,
                    help="write a roofline summary JSON artifact here")
    args = ap.parse_args()

    dtype = jnp.float32
    import algames_tpu as ag
    from __graft_entry__ import _flagship_problem

    prob, spec = _flagship_problem(dtype=dtype, outer=3, inner=8)
    if os.environ.get("PROFILE_LS_FUSED", "1") != "0":
        import dataclasses
        prob = dataclasses.replace(
            prob, opts=dataclasses.replace(prob.opts, ls_fused=True))
    key = jax.random.PRNGKey(0)
    n_tot = args.chunks * args.batch
    x0s = jnp.tile(prob.x0[None], (n_tot, 1))
    x0s = x0s + 0.05 * jax.random.normal(key, x0s.shape, dtype)

    # Same program the bench times: the whole sweep is ONE dispatch with the
    # chunk loop on device (parallel.solve_many).
    fn = jax.jit(lambda x: ag.parallel.solve_many(prob, x,
                                                  method=args.method,
                                                  chunk=args.batch))
    jax.block_until_ready(fn(x0s).traj.x)   # compile

    os.system(f"rm -rf {args.logdir}")
    with jax.profiler.trace(args.logdir):
        out = fn(x0s)
        jax.block_until_ready(out.traj.x)

    # Locate the raw .xplane.pb and convert to hlo_stats.
    planes = glob.glob(os.path.join(args.logdir, "**", "*.xplane.pb"),
                       recursive=True)
    assert planes, f"no xplane.pb under {args.logdir}"
    from xprof.convert import raw_to_tool_data as rtd
    params = {"use_saved_result": False}
    data, _ = rtd.xspace_to_tool_data([planes[0]], "hlo_stats", params)
    if isinstance(data, bytes):
        data = data.decode()
    obj = json.loads(data)
    # hlo_stats is a gviz table: cols + rows.
    cols = [c["label"] for c in obj["cols"]]
    rows = [[c.get("v") for c in r["c"]] for r in obj["rows"]]
    i_cat = cols.index("HLO op category")
    i_name = cols.index("HLO op name")
    i_self = cols.index("Total self time (us)")
    i_occ = cols.index("#Occurrences")
    i_hbm = cols.index("HBM BW (GiB/s)")
    i_bound = cols.index("Bound by")

    total = sum(r[i_self] or 0.0 for r in rows)
    per_chunk_ms = total / args.chunks / 1e3
    print(f"total device self-time {total/1e3:.2f} ms over {args.chunks} "
          f"chunks -> {per_chunk_ms:.3f} ms/chunk "
          f"-> asymptote {args.batch/ per_chunk_ms * 1e3:.0f} solves/s")

    # HBM traffic: sum over ops of (self time x measured HBM BW) = bytes.
    hbm_bytes = sum((r[i_self] or 0.0) * 1e-6 * (r[i_hbm] or 0.0) * 2**30
                    for r in rows)
    PEAK_GIBS = 819e9 / 2**30     # v5e: 819 GB/s HBM
    print(f"HBM traffic {hbm_bytes/args.chunks/1e6:.1f} MB/chunk; "
          f"avg utilization {hbm_bytes/2**30/(total*1e-6)/PEAK_GIBS*100:.1f}% "
          f"of 819 GB/s")

    # Aggregate by category and by op name.
    by_cat, by_name = {}, {}
    for r in rows:
        by_cat[r[i_cat]] = by_cat.get(r[i_cat], 0.0) + (r[i_self] or 0.0)
        key_ = r[i_name]
        e = by_name.setdefault(key_, [0.0, 0, r[i_cat], 0.0, r[i_bound]])
        e[0] += r[i_self] or 0.0
        e[1] += r[i_occ] or 0
        e[3] = max(e[3], r[i_hbm] or 0.0)
    print("\n-- by category --")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{v/total*100:6.2f}%  {v/args.chunks/1e3:8.3f} ms/chunk  {k}")
    print(f"\n-- top {args.top} ops by self time --")
    for k, (v, occ, cat, hbm, bound) in sorted(
            by_name.items(), key=lambda kv: -kv[1][0])[:args.top]:
        print(f"{v/total*100:6.2f}%  {v/args.chunks/1e3:8.3f} ms/chunk  "
              f"x{int(occ):5d}  hbm={hbm:6.1f}GiB/s  [{cat}|{bound}] {k[:90]}")

    if args.json:
        pallas_us = sum(v for k, (v, *_rest) in by_name.items()
                        if k.startswith("body."))
        summary = {
            "platform": jax.devices()[0].platform,
            "config": f"batch={args.batch} chunks={args.chunks} "
                      f"method={args.method}",
            "device_self_time_ms_per_chunk": round(per_chunk_ms, 3),
            "device_bound_solves_per_s": round(args.batch / per_chunk_ms
                                               * 1e3, 0),
            "hbm_traffic_mb_per_chunk": round(hbm_bytes / args.chunks / 1e6,
                                              1),
            "hbm_utilization_pct_of_819GBs": round(
                hbm_bytes / 2**30 / (total * 1e-6) / PEAK_GIBS * 100, 2),
            "pallas_ms_per_chunk": round(pallas_us / args.chunks / 1e3, 3),
            "by_category_ms_per_chunk": {
                k: round(v / args.chunks / 1e3, 3)
                for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])},
            "note": ("The solve is NOT HBM-bound (utilization ~0.1-8%): all "
                     "per-iteration state fits in VMEM and ops are small-"
                     "matrix VPU work across 128-lane tiles.  The justified "
                     "bound is the VPU flop roofline of the fused sweep "
                     "kernels plus XLA glue; see docs/PERF.md for the "
                     "per-knot flop count and the speed-of-light argument."),
        }
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
