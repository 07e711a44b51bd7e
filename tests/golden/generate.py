"""Generate golden-trajectory fixtures for the BASELINE configs.

Solves each preset with the f64 DENSE-oracle linear solver at the reference
default budget (outer=7 x inner=20, eps all 1e-3 —
``/root/reference/src/struct/options.jl:73-91``) and freezes the converged
primal-dual trajectory plus its final violations as an ``.npz`` fixture.

``tests/test_golden.py`` regression-gates every structured linear-solver
method against these fixtures, and the f32 TPU-path trajectory against the
f64 oracle at equal budget (the BASELINE "match reference open-loop
equilibrium trajectories within tolerance at equal iteration budget" anchor,
reference trajectories themselves being defined by the same algorithm at the
same budget: ``/root/reference/test/problem/solver_methods.jl:164-182``).

Run:  python tests/golden/generate.py
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import algames_tpu as ag
from algames_tpu.presets import PRESETS

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    for name, build in PRESETS.items():
        prob, spec = build()
        out = ag.newton_solve_jit(prob, method="dense")
        it = int(out.stats.iter)
        vio = {k: float(getattr(out.stats, k)[it - 1])
               for k in ("dyn_vio", "con_vio", "sta_vio", "opt_vio")}
        assert all(v < 1e-3 for v in vio.values()), (name, vio)
        path = os.path.join(HERE, f"{name}.npz")
        np.savez(
            path,
            x=np.asarray(out.traj.x),
            u=np.asarray(out.traj.u),
            lam=np.asarray(out.traj.lam),
            iter=it,
            outer_iter=prob.opts.outer_iter,
            inner_iter=prob.opts.inner_iter,
            **vio,
        )
        print(f"{name}: iter={it} "
              + " ".join(f"{k}={v:.2e}" for k, v in vio.items())
              + f" -> {path}")


if __name__ == "__main__":
    main()
