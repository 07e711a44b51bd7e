"""Monte-Carlo throughput benchmark — BASELINE config 5.

4096 initial-condition scenarios of the 3-player game, sharded over all
available devices via the parallel.shard path (single chip here; the same
code scales over a pod slice).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    if os.environ.get("PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    dtype = jnp.float32
    import algames_tpu as ag
    from algames_tpu.parallel import make_mesh, sharded_monte_carlo
    from __graft_entry__ import _flagship_problem

    prob, spec = _flagship_problem(dtype=dtype, outer=3, inner=8)
    batch = int(os.environ.get("MC_BATCH", "4096"))
    mesh = make_mesh()
    x0s = jnp.tile(prob.x0[None], (batch, 1))
    x0s = x0s + 0.05 * jax.random.normal(jax.random.PRNGKey(0), x0s.shape, dtype)

    import functools
    fn = jax.jit(functools.partial(sharded_monte_carlo, prob, mesh,
                                   method="pallas"))
    trajs, summary = fn(x0s)
    jax.block_until_ready(trajs)
    t0 = time.perf_counter()
    trajs, summary = fn(x0s)
    jax.block_until_ready(trajs)
    t = time.perf_counter() - t0
    print(json.dumps({
        "metric": "monte_carlo_4096_solves_per_s",
        "value": round(batch / t, 2),
        "unit": "solves/s",
        "devices": mesh.devices.size,
        "converged_frac": round(float(summary["converged_frac"]), 3),
        "mean_iters": round(float(summary["mean_iters"]), 1),
    }))


if __name__ == "__main__":
    main()
