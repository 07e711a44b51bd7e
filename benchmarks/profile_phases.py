"""Phase breakdown of the flagship bench: where does a batched solve spend
its time?  Times (on the real chip, batch from BENCH_BATCH) the three
per-inner-iteration phases in isolation plus the full solve:

  assemble   fused residual+Jacobian+violations  (residual.assemble, vmapped)
  solve      the Pallas Thomas KKT sweep          (ops.thomas_pallas)
  ls_trial   one line-search trial residual+norm  (residual.residual)
  full       the whole newton_solve batch         (parallel.solve_batch)

Prints one line per phase: median ms / batch and the implied per-inner-
iteration budget breakdown.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    dtype = jnp.float32
    import algames_tpu as ag
    from algames_tpu.problem import residual as R
    from algames_tpu.ops.thomas_pallas import thomas_pallas_for_spec
    from __graft_entry__ import _flagship_problem

    prob, spec = _flagship_problem(dtype=dtype, outer=3, inner=8)
    batch = int(os.environ.get("BENCH_BATCH", "512"))
    key = jax.random.PRNGKey(0)
    x0s = jnp.tile(prob.x0[None], (batch, 1))
    x0s = x0s + 0.05 * jax.random.normal(key, x0s.shape, dtype)

    # A representative iterate: run the full solve once, use its trajectories.
    full = jax.jit(lambda x: ag.parallel.solve_batch(prob, x, method="pallas"))
    res0 = full(x0s)
    jax.block_until_ready(res0.traj.x)
    traj = res0.traj
    gc = res0.gc

    model, obj = prob.model, prob.obj

    @jax.jit
    def assemble(traj, gc):
        return jax.vmap(lambda t, g: R.assemble(model, spec, obj, g, t,
                                                reg=1e-3))(traj, gc)

    @jax.jit
    def ls_trial(traj, gc):
        def one(t, g):
            r = R.residual(model, spec, obj, g, t, reg=1e-3, traj_ref=t)
            return R.residual_norm(spec, r)
        return jax.vmap(one)(traj, gc)

    res, jb, _, _ = assemble(traj, gc)
    b = jax.vmap(lambda r: R.residual_knot_blocks(spec, r))(res)

    @jax.jit
    def solve(jb, b):
        return jax.vmap(thomas_pallas_for_spec(spec))(jb, -b)

    t_full = timeit(full, x0s, reps=5)
    t_asm = timeit(assemble, traj, gc)
    t_ls = timeit(ls_trial, traj, gc)
    t_solve = timeit(solve, jb, b)

    mean_iters = float(jnp.mean(res0.stats.iter))
    print(f"batch={batch} mean_recorded_iters={mean_iters:.1f}")
    print(f"full solve       : {t_full*1e3:9.2f} ms/batch "
          f"({batch/t_full:8.1f} solves/s)")
    print(f"assemble (fused) : {t_asm*1e3:9.2f} ms")
    print(f"pallas KKT solve : {t_solve*1e3:9.2f} ms")
    print(f"LS trial residual: {t_ls*1e3:9.2f} ms")
    per_it = t_asm + t_solve + t_ls      # >=1 LS trial per iteration
    print(f"one iteration ≈ assemble+solve+1 LS = {per_it*1e3:.2f} ms; "
          f"x{mean_iters:.1f} iters = {per_it*mean_iters*1e3:.2f} ms "
          f"(vs {t_full*1e3:.2f} measured)")


if __name__ == "__main__":
    main()
