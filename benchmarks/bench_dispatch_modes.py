"""Dispatch-strategy comparison for the headline throughput (VERDICT r3 #1).

Three ways to run 4096 scenarios x full solves on one chip:
  pipeline — 32 python-dispatched 128-lane chunks (async queue; round-2 mode)
  map      — ONE dispatch: lax.map over 32 chunks inside a single jit
             (zero host involvement between chunks; device runs them
             back-to-back)
  hybrid   — C_OUT python-dispatched super-chunks, each lax.map over C_IN
             chunks (pipeline across super-chunks hides the single RPC)

Prints one line per mode.  Usage: python benchmarks/bench_dispatch_modes.py
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/repo/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    import algames_tpu as ag
    from __graft_entry__ import _flagship_problem

    dtype = jnp.float32
    prob, spec = _flagship_problem(dtype=dtype, outer=3, inner=8)
    batch, chunks, reps = 128, 32, 3
    key = jax.random.PRNGKey(0)
    x0s = jnp.tile(prob.x0[None], (chunks, batch, 1))
    x0s = x0s + 0.05 * jax.random.normal(key, x0s.shape, dtype)

    solve_chunk = lambda x: ag.parallel.solve_batch(prob, x, method="pallas")

    def run(fn, xs_list):
        fn(xs_list[0]) if not isinstance(xs_list[0], list) else None
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [fn(x) for x in xs_list]
            jax.block_until_ready(outs)
            ts.append(time.perf_counter() - t0)
        return batch * chunks / min(ts)

    results = {}

    # pipeline: 32 dispatches of one chunk
    fn_p = jax.jit(solve_chunk)
    jax.block_until_ready(fn_p(x0s[0]).traj.x)
    results["pipeline"] = run(fn_p, [x0s[c] for c in range(chunks)])

    # map: one dispatch of lax.map over all 32 chunks
    fn_m = jax.jit(lambda xs: jax.lax.map(lambda x: solve_chunk(x).traj.x,
                                          xs))
    jax.block_until_ready(fn_m(x0s))
    results["map"] = run(fn_m, [x0s])

    # hybrid: 8 dispatches, each lax.map over 4 chunks
    c_in = 4
    xs_h = x0s.reshape(chunks // c_in, c_in, batch, -1)
    fn_h = jax.jit(lambda xs: jax.lax.map(lambda x: solve_chunk(x).traj.x,
                                          xs))
    jax.block_until_ready(fn_h(xs_h[0]))
    results["hybrid_8x4"] = run(fn_h, [xs_h[i] for i in range(len(xs_h))])

    for k, v in results.items():
        print(json.dumps({"mode": k, "solves_per_s": round(v, 1)}))


if __name__ == "__main__":
    main()
