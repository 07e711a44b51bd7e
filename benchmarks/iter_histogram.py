"""Per-lane iteration histogram of the flagship bench program.

The flat AL x Newton while_loop costs each 128-lane chunk the MAX total
iteration count over its lanes; the gap between the mean and the max is the
straggler overhead that chunked dispatch (bench.py BENCH_CHUNKS) amortizes.
This prints the distribution so budget/chunk tuning is data-driven.
"""
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


def main():
    dtype = jnp.float32
    import algames_tpu as ag
    from __graft_entry__ import _flagship_problem

    prob, spec = _flagship_problem(dtype=dtype, outer=3, inner=8)
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    chunks = int(os.environ.get("BENCH_CHUNKS", "4"))
    key = jax.random.PRNGKey(0)
    x0s = jnp.tile(prob.x0[None], (chunks, batch, 1))
    x0s = x0s + 0.05 * jax.random.normal(key, x0s.shape, dtype)

    fn = jax.jit(lambda x: ag.parallel.solve_batch(prob, x, method="pallas"))
    iters = []
    for c in range(chunks):
        q = fn(x0s[c])
        # stats.iter counts records = inner iterations + 1 final record.
        iters.append(np.asarray(q.stats.iter) - 1)
    it = np.concatenate(iters)
    qs = np.percentile(it, [0, 25, 50, 75, 90, 99, 100])
    print(f"lanes={it.size} mean={it.mean():.2f} "
          f"p0/p25/p50/p75/p90/p99/max={qs.astype(int).tolist()}")
    print("per-chunk max:", [int((np.asarray(x) - 1).max()) for x in iters])


if __name__ == "__main__":
    main()
