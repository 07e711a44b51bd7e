"""In-loop phase costs of the fused flat solver.

Standalone-jit phase timings (``profile_phases.py``) overstate dispatch
overhead by ~3x; this script measures phases INSIDE the fused while_loop by
timing ablated variants of the flat solve at a FIXED iteration count
(convergence gates disabled, every lane runs outer*inner iterations):

  full        the real iteration (rebuild + KKT + line search)
  id_kkt      KKT solve replaced by dflat = -b   (cost of assemble+LS)
  ls1         line search evaluates 1 trial instead of ls_parallel
  ls_only     rebuild+KKT with alpha fixed (no trial evaluations at all)

Differences between variants give the in-loop cost of each phase.  The
ablated solvers do NOT converge to the same trajectories — they exist only
to attribute time.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/repo/.jax_cache"))


def timeit(fn, *args, reps=5):
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
    import dataclasses

    import algames_tpu as ag
    from algames_tpu.problem import solver as S
    from __graft_entry__ import _flagship_problem

    outer, inner = 3, 8
    prob, spec = _flagship_problem(dtype=dtype, outer=outer, inner=inner)
    # Disable all early exits: every lane runs exactly outer*inner iterations.
    opts = dataclasses.replace(prob.opts, eps_dyn=0.0, eps_con=0.0,
                               eps_sta=0.0, eps_opt=0.0, delta_min=0.0)
    prob = dataclasses.replace(prob, opts=opts)
    iters = outer * inner

    batch = int(os.environ.get("BENCH_BATCH", "128"))
    key = jax.random.PRNGKey(0)
    x0s = jnp.tile(prob.x0[None], (batch, 1))
    x0s = x0s + 0.05 * jax.random.normal(key, x0s.shape, dtype)

    method = os.environ.get("BENCH_METHOD", "pallas")
    variants = {}

    def run(x0s, prob=prob, method=method):
        return jax.vmap(lambda x: S.newton_solve(
            dataclasses.replace(prob, x0=x), method=method))(x0s).traj.x

    variants["full"] = jax.jit(run)

    # --- id_kkt: replace the structured solve with dflat = -b -------------
    orig_iteration = S._iteration

    def make_ablated(kkt=True, n_trials=None, fixed_alpha=False):
        import algames_tpu.problem.residual as R
        from algames_tpu.core.traj import update_traj, delta_step

        def iteration(model, spec, obj, opts, method, gc, traj, pd, stats,
                      outer_k, l, delta_prev, alpha_prev):
            dt_ = traj.x.dtype
            reg = opts.reg_0 * ((l + 1).astype(dt_)) ** 4
            reg_eff = reg if opts.regularize else 0.0
            res, jb, sta_v, con_v = R.assemble_from_point(
                spec, obj, gc, traj, pd, reg=reg_eff)
            res_norm = R.residual_norm(spec, res)
            dyn_v = R.dynamics_violation(res)
            opt_v = R.optimality_violation(res)
            from algames_tpu.stats import record
            stats = record(stats, True, outer_k + 1, res_norm, delta_prev,
                           alpha_prev, dyn_v, con_v, sta_v, opt_v)
            last_vio = jnp.stack([dyn_v, con_v, sta_v, opt_v])
            b = R.residual_knot_blocks(spec, res)
            if kkt:
                from algames_tpu.ops.thomas_pallas import thomas_pallas_for_spec
                dflat = thomas_pallas_for_spec(spec)(jb, -b)
            else:
                dflat = (-b).reshape(-1)
            from algames_tpu.core.traj import unpack_step
            dtraj = unpack_step(spec, dflat)
            if fixed_alpha:
                alpha = jnp.asarray(0.5, dt_)
                pd_ls = R.point_data(model, spec, obj, gc,
                                     update_traj(traj, alpha, dtraj))
                j = jnp.asarray(1, jnp.int32)
            else:
                import dataclasses as dc
                o2 = dc.replace(opts, ls_parallel=n_trials) if n_trials else opts
                alpha, j, found, pd_ls = S.line_search(
                    model, spec, obj, gc, o2, traj, dtraj, res_norm, reg)
            traj_new = update_traj(traj, alpha, dtraj)
            delta = delta_step(dtraj, alpha)
            traj = traj_new
            pd = pd_ls
            stop = jnp.asarray(False)
            return traj, pd, stats, last_vio, delta, alpha, stop

        return iteration

    for name, kw in [("id_kkt", dict(kkt=False)),
                     ("ls1", dict(n_trials=1)),
                     ("ls_only", dict(fixed_alpha=True))]:
        S._iteration = make_ablated(**kw)
        variants[name] = jax.jit(run)
        # Trigger trace now while the monkeypatch is in place.
        variants[name](x0s).block_until_ready()
        S._iteration = orig_iteration

    S._iteration = orig_iteration
    times = {}
    for name, fn in variants.items():
        times[name] = timeit(fn, x0s)
    t_full = times["full"]
    per_it = {k: v / iters * 1e3 for k, v in times.items()}
    print(f"batch={batch} iters={iters} method={method}")
    for k in ("full", "id_kkt", "ls1", "ls_only"):
        print(f"{k:8s}: {times[k]*1e3:8.2f} ms total  {per_it[k]:6.3f} ms/iter")
    print(f"KKT in-loop cost   : {(t_full - times['id_kkt'])/iters*1e3:6.3f} ms/iter")
    print(f"2nd LS trial cost  : {(t_full - times['ls1'])/iters*1e3:6.3f} ms/iter")
    print(f"LS trials (all)    : {(t_full - times['ls_only'])/iters*1e3:6.3f} ms/iter "
          f"(ls_only still pays 1 point_data for the carry)")


if __name__ == "__main__":
    main()
