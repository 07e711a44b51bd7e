"""Hand-written lane-last Pallas kernel: fused line-search trial evaluation
(unicycle family).

The generic vmap-in-kernel fusion (``ops/trial_pallas.py``) is blocked by
Mosaic (AD-generated bodies and some vmap-lowered broadcasts abort the
compiler — probe table in ``docs/PERF.md``).  This module takes the
hand-written route the probes showed IS lowerable: every operation is a
static slice or an elementwise op on 2-D/3-D lane-last blocks, in the exact
style of ``ops/thomas_pallas.py``.

Specialization (checked by :func:`handwritten_supported`):

* ``UnicycleGame`` dynamics (any player count) — the RK2 dual pulls
  ``A^T lam`` / ``B^T lam`` are hand-derived from the midpoint step
  ``F = x + dt f(x + dt/2 f(x,u), u)`` with
  ``f = [cos(th) v; sin(th) v; u]`` (reference ``unicycle.jl:28-33``):

    J_f(x)^T mu = [0; 0; -sin(th) v mu_x + cos(th) v mu_y;
                         cos(th) mu_x + sin(th) mu_y]
    g     = dt J_f(m)^T lam,    m = x + (dt/2) f(x, u)
    A^T l = lam + g + (dt/2) J_f(x)^T g
    B^T l = J_fu^T [(dt/2) g + dt lam],   J_fu^T mu = [mu_th; mu_v]

* diagonal objective without CollisionCost pairs;
* state constraints: pairwise collision only (per-knot scalar rows);
* control constraints: box bounds only.

This covers the flagship bench, the MPC highway config, and the
Monte-Carlo sweep.  Everything it computes mirrors
``residual.point_lite_res`` + the Tikhonov pull + the L1 norm of
``solver.line_search`` (reference per-trial ``residual!``,
``src/problem/solver_methods.jl:111-123``); op order differs from the XLA
pass at ULP level, so the fused path is opt-in (``Options.ls_fused``).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.traj import update_traj


def handwritten_supported(model, spec, obj, gc) -> bool:
    from ..constraints import kernels as _k
    from ..models.unicycle import UnicycleGame
    if not isinstance(model, UnicycleGame) or not spec.homogeneous:
        return False
    if obj.pair_i:
        return False
    for blk in gc.state_blocks:
        if not isinstance(blk.params, _k.CollisionParams):
            return False
        if blk.sense != "ineq":
            return False
    for blk in gc.control_blocks:
        if not isinstance(blk.params, _k.BoundParams):
            return False
        if blk.sense != "ineq":
            return False
    return True


def _structure_key(spec, gc):
    """Static descriptor of the problem structure for the kernel cache."""
    s_meta = tuple((blk.owner, tuple(blk.params.pxi), tuple(blk.params.pxj))
                   for blk in gc.state_blocks)
    c_meta = tuple((tuple(blk.params.mask),) for blk in gc.control_blocks)
    return (spec.T, spec.n, spec.m, spec.p, float(spec.dt), s_meta, c_meta)


def _make_kernel(T, n, m, p, N, dt, s_meta, c_meta, BL):
    """Kernel for grid (B//BL, T).  See module docstring for the math."""
    nsb = len(s_meta)
    ncb = len(c_meta)

    def f_lane(x, u):
        th, v = x[2 * p:3 * p], x[3 * p:4 * p]
        return jnp.concatenate([jnp.cos(th) * v, jnp.sin(th) * v, u], axis=0)

    def jfT(x, mu):
        th, v = x[2 * p:3 * p], x[3 * p:4 * p]
        mx, my = mu[0:p], mu[p:2 * p]
        gth = -jnp.sin(th) * v * mx + jnp.cos(th) * v * my
        gv = jnp.cos(th) * mx + jnp.sin(th) * my
        return jnp.concatenate([jnp.zeros_like(mu[:2 * p]), gth, gv], axis=0)

    def kernel(*refs):
        (x_t, x_t1, u_t, u_t1, lam_t, lam_t1, tikx_t, tiku_t, Qd, xf, Rdp,
         ufp) = refs[:12]
        it = 12
        sblocks = []
        for _ in range(nsb):
            sblocks.append(refs[it:it + 3])       # r2, clam, cmu
            it += 3
        cblocks = []
        for _ in range(ncb):
            cblocks.append(refs[it:it + 4])       # zmax, zmin, blam, bmu
            it += 4
        (rx0_o, ru0_o, rd_o) = refs[it:it + 3]
        it += 3
        sc_o = refs[it:it + nsb]
        it += nsb
        cc_o = refs[it:it + ncb]
        it += ncb
        npart_o = refs[it]

        t = pl.program_id(1)
        dtype = x_t.dtype
        one = jnp.ones((), dtype)
        zero = jnp.zeros((), dtype)

        xt = x_t[0]                    # [n, BL]
        xt1 = x_t1[0]
        ut = u_t[0]                    # [m, BL]
        ut1 = u_t1[0]
        lamt = lam_t[0]                # [p, n, BL]
        lamt1 = lam_t1[0]

        # Dynamics residual rd_t = F(x_t, u_t) - x_{t+1}.
        mid = xt + (0.5 * dt) * f_lane(xt, ut)
        Fx = xt + dt * f_lane(mid, ut)
        rd = Fx - xt1

        # Dual pulls at knot t (B^T lam_t) and knot t+1 (A^T lam_{t+1};
        # masked out at the last knot, where row T has no gx term).
        mid1 = xt1 + (0.5 * dt) * f_lane(xt1, ut1)
        gmask = jnp.where(t < T - 1, one, zero)
        gx_rows = []
        gu_rows = []
        for i in range(p):
            g1 = dt * jfT(mid1, lamt1[i])
            gx_rows.append(lamt1[i] + g1 + (0.5 * dt) * jfT(xt1, g1))
            g0 = dt * jfT(mid, lamt[i])
            w = (0.5 * dt) * g0 + dt * lamt[i]
            gu_rows.append(jnp.concatenate([w[2 * p:3 * p], w[3 * p:4 * p]],
                                           axis=0))
        gx = jnp.stack(gx_rows)         # [p, n, BL]
        gu = jnp.stack(gu_rows)         # [p, m, BL]

        # Cost gradients: qx at knot t+1 (dt scale; 1 at the terminal
        # knot), r at knot t (owner-picked diagonal).
        scale = jnp.where(t + 1 < N - 1, jnp.asarray(dt, dtype), one)
        qx = Qd[0] * (xt1[None] - xf[0]) * scale       # [p, n, BL]
        ru_cost = Rdp[0] * (ut - ufp[0]) * dt          # [m, BL]

        # Owner pick of gu: unicycle owner map is [0..p-1, 0..p-1].
        rid_m = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        gu_pick = jnp.zeros((m, BL), dtype)
        for i in range(p):
            mask_i = ((rid_m == i) | (rid_m == i + p)).astype(dtype)
            gu_pick = gu_pick + mask_i * gu[i]

        rx0 = qx + gmask * gx - lamt                   # [p, n, BL]
        ru0 = ru_cost + gu_pick                        # [m, BL]

        # AL gradients (residual only — the carried lite excludes them).
        rid_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        al_x = jnp.zeros((p, n, BL), dtype)
        rid_p = jax.lax.broadcasted_iota(jnp.int32, (p, 1, 1), 0)
        for k, (owner, pxi, pxj) in enumerate(s_meta):
            r2_ref, clam_ref, cmu_ref = sblocks[k]
            r2 = r2_ref[0]                             # [1, BL]
            d0 = xt1[pxi[0]:pxi[0] + 1] - xt1[pxj[0]:pxj[0] + 1]  # [1, BL]
            d1 = xt1[pxi[1]:pxi[1] + 1] - xt1[pxj[1]:pxj[1] + 1]
            c = r2 - (d0 * d0 + d1 * d1)               # [1, BL]
            lam_c = clam_ref[0]                        # [1, BL]
            mu_c = cmu_ref[0]
            irho = jnp.where((c >= 0.0) | (lam_c > 0.0), mu_c, 0.0)
            w = lam_c + irho * c                       # [1, BL]
            coef = -2.0 * w
            grad = (((rid_n == pxi[0]).astype(dtype) - (rid_n == pxj[0])
                     .astype(dtype)) * (coef * d0)
                    + ((rid_n == pxi[1]).astype(dtype) - (rid_n == pxj[1])
                       .astype(dtype)) * (coef * d1))  # [n, BL]
            onehot_p = (rid_p == owner).astype(dtype)  # [p, 1, 1]
            al_x = al_x + onehot_p * grad[None]
            sc_o[k][...] = c[None]

        al_u = jnp.zeros((m, BL), dtype)
        for k, (mask,) in enumerate(c_meta):
            zmax_ref, zmin_ref, blam_ref, bmu_ref = cblocks[k]
            zmax = zmax_ref[0]                         # [m, BL] via [1,m,BL]
            zmin = zmin_ref[0]
            # Static finite-bound mask as iota compares (meta tuple).
            mk_u = sum(((rid_m == j).astype(dtype)
                        for j in range(m) if mask[j]),
                       jnp.zeros((m, 1), dtype))
            mk_l = sum(((rid_m == j).astype(dtype)
                        for j in range(m) if mask[m + j]),
                       jnp.zeros((m, 1), dtype))
            c_up = (ut - zmax) * mk_u                  # [m, BL]
            c_lo = (zmin - ut) * mk_l
            c = jnp.concatenate([c_up, c_lo], axis=0)  # [2m, BL]
            lam_c = blam_ref[0]                        # [2m, BL]
            mu_c = bmu_ref[0]
            irho = jnp.where((c >= 0.0) | (lam_c > 0.0), mu_c, 0.0)
            w = lam_c + irho * c
            al_u = al_u + w[:m] * mk_u - w[m:] * mk_l
            cc_o[k][...] = c[None]

        # Residual rows incl. Tikhonov pull; L1 contribution of this knot.
        rx_res = rx0 + al_x + tikx_t[0][None]          # [p, n, BL]
        ru_res = ru0 + al_u + tiku_t[0]                # [m, BL]
        npart = (jnp.sum(jnp.sum(jnp.abs(rx_res), axis=0), axis=0,
                         keepdims=True)
                 + jnp.sum(jnp.abs(ru_res), axis=0, keepdims=True)
                 + jnp.sum(jnp.abs(rd), axis=0, keepdims=True))  # [1, BL]

        rx0_o[...] = rx0[None]
        ru0_o[...] = ru0[None]
        rd_o[...] = rd[None]
        npart_o[...] = npart[None]

    return kernel


def _make_kernel_h(T, n, m, p, N, dt, s_meta, c_meta, BL):
    """Whole-horizon variant: grid (B//BL,) — ONE program per lane tile
    computes every knot at once (the trial has no cross-knot recursion, so
    the per-knot grid of :func:`_make_kernel` only added program overhead
    and T-fold reloads of the per-problem constants).  Identical math and
    identical per-knot |.|-sum order (npart stays [T, 1, BL])."""
    nsb = len(s_meta)
    ncb = len(c_meta)

    def f_lane(x, u):                      # [T, n, BL], [T, m, BL]
        th, v = x[:, 2 * p:3 * p], x[:, 3 * p:4 * p]
        return jnp.concatenate([jnp.cos(th) * v, jnp.sin(th) * v, u],
                               axis=1)

    def jfT(x, mu):
        th, v = x[:, 2 * p:3 * p], x[:, 3 * p:4 * p]
        mx, my = mu[:, 0:p], mu[:, p:2 * p]
        gth = -jnp.sin(th) * v * mx + jnp.cos(th) * v * my
        gv = jnp.cos(th) * mx + jnp.sin(th) * my
        return jnp.concatenate([jnp.zeros_like(mu[:, :2 * p]), gth, gv],
                               axis=1)

    def kernel(*refs):
        (x_r, u_r, lam_r, tikx_r, tiku_r, Qd_r, xf_r, Rdp_r,
         ufp_r) = refs[:9]
        it = 9
        sblocks = []
        for _ in range(nsb):
            sblocks.append(refs[it:it + 3])
            it += 3
        cblocks = []
        for _ in range(ncb):
            cblocks.append(refs[it:it + 4])
            it += 4
        (rx0_o, ru0_o, rd_o) = refs[it:it + 3]
        it += 3
        sc_o = refs[it:it + nsb]
        it += nsb
        cc_o = refs[it:it + ncb]
        it += ncb
        npart_o = refs[it]

        dtype = x_r.dtype
        x = x_r[...]                       # [N, n, BL]
        u = u_r[...]                       # [T, m, BL]
        lam = lam_r[...]                   # [T, p, n, BL]
        tikx = tikx_r[...]                 # [T, n, BL]
        tiku = tiku_r[...]
        Qd = Qd_r[0]                       # [p, n, BL]
        xf = xf_r[0]
        Rdp = Rdp_r[0]                     # [m, BL]
        ufp = ufp_r[0]

        xt, xt1 = x[:-1], x[1:]
        mid = xt + (0.5 * dt) * f_lane(xt, u)
        Fx = xt + dt * f_lane(mid, u)
        rd = Fx - xt1                      # [T, n, BL]

        gx_rows, gu_rows = [], []
        for i in range(p):
            g0 = dt * jfT(mid, lam[:, i])
            gx_rows.append(lam[:, i] + g0 + (0.5 * dt) * jfT(xt, g0))
            w = (0.5 * dt) * g0 + dt * lam[:, i]
            gu_rows.append(jnp.concatenate(
                [w[:, 2 * p:3 * p], w[:, 3 * p:4 * p]], axis=1))
        gx = jnp.stack(gx_rows, axis=1)    # [T, p, n, BL] at knot t
        gu = jnp.stack(gu_rows, axis=1)    # [T, p, m, BL]
        gx_shift = jnp.concatenate(
            [gx[1:], jnp.zeros_like(gx[:1])], axis=0)

        tid = jax.lax.broadcasted_iota(jnp.int32, (T, 1, 1), 0)
        scale = jnp.where(tid + 1 < N - 1, jnp.asarray(dt, dtype),
                          jnp.ones((), dtype))             # [T, 1, 1]
        qx = Qd[None] * (xt1[:, None] - xf[None]) * scale[:, None]
        ru_cost = Rdp[None] * (u - ufp[None]) * dt         # [T, m, BL]

        rid_m = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        gu_pick = jnp.zeros((T, m, BL), dtype)
        for i in range(p):
            mask_i = ((rid_m == i) | (rid_m == i + p)).astype(dtype)
            gu_pick = gu_pick + mask_i[None] * gu[:, i]

        rx0 = qx + gx_shift - lam                          # [T, p, n, BL]
        ru0 = ru_cost + gu_pick

        rid_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        rid_p = jax.lax.broadcasted_iota(jnp.int32, (p, 1, 1), 0)
        al_x = jnp.zeros((T, p, n, BL), dtype)
        for k, (owner, pxi, pxj) in enumerate(s_meta):
            r2_ref, clam_ref, cmu_ref = sblocks[k]
            r2 = r2_ref[0]                                 # [1, BL]
            d0 = xt1[:, pxi[0]:pxi[0] + 1] - xt1[:, pxj[0]:pxj[0] + 1]
            d1 = xt1[:, pxi[1]:pxi[1] + 1] - xt1[:, pxj[1]:pxj[1] + 1]
            c = r2[None] - (d0 * d0 + d1 * d1)             # [T, 1, BL]
            lam_c = clam_ref[...]                          # [T, 1, BL]
            mu_c = cmu_ref[...]
            irho = jnp.where((c >= 0.0) | (lam_c > 0.0), mu_c, 0.0)
            w = lam_c + irho * c
            coef = -2.0 * w                                # [T, 1, BL]
            grad = (((rid_n == pxi[0]).astype(dtype)
                     - (rid_n == pxj[0]).astype(dtype))[None] * (coef * d0)
                    + ((rid_n == pxi[1]).astype(dtype)
                       - (rid_n == pxj[1]).astype(dtype))[None]
                    * (coef * d1))                         # [T, n, BL]
            onehot_p = (rid_p == owner).astype(dtype)      # [p, 1, 1]
            al_x = al_x + onehot_p[None] * grad[:, None]
            sc_o[k][...] = c

        al_u = jnp.zeros((T, m, BL), dtype)
        for k, (mask,) in enumerate(c_meta):
            zmax_ref, zmin_ref, blam_ref, bmu_ref = cblocks[k]
            zmax = zmax_ref[0]                             # [m, BL]
            zmin = zmin_ref[0]
            mk_u = sum(((rid_m == j).astype(dtype)
                        for j in range(m) if mask[j]),
                       jnp.zeros((m, 1), dtype))
            mk_l = sum(((rid_m == j).astype(dtype)
                        for j in range(m) if mask[m + j]),
                       jnp.zeros((m, 1), dtype))
            c_up = (u - zmax[None]) * mk_u[None]           # [T, m, BL]
            c_lo = (zmin[None] - u) * mk_l[None]
            c = jnp.concatenate([c_up, c_lo], axis=1)      # [T, 2m, BL]
            lam_c = blam_ref[...]
            mu_c = bmu_ref[...]
            irho = jnp.where((c >= 0.0) | (lam_c > 0.0), mu_c, 0.0)
            w = lam_c + irho * c
            al_u = al_u + w[:, :m] * mk_u[None] - w[:, m:] * mk_l[None]
            cc_o[k][...] = c

        rx_res = rx0 + al_x + tikx[:, None]
        ru_res = ru0 + al_u + tiku
        npart = (jnp.sum(jnp.sum(jnp.abs(rx_res), axis=1), axis=1,
                         keepdims=True)
                 + jnp.sum(jnp.abs(ru_res), axis=1, keepdims=True)
                 + jnp.sum(jnp.abs(rd), axis=1, keepdims=True))  # [T, 1, BL]

        rx0_o[...] = rx0
        ru0_o[...] = ru0
        rd_o[...] = rd
        npart_o[...] = npart

    return kernel


def _trial_eval_handwritten(model, spec, obj, gc, traj, dtraj, alpha,
                            reg_eff, block_lanes=128, interpret=False):
    """Batched fused trial: all leaves carry a LEADING batch axis [B, ...].
    Returns ``(tn [B], lite)`` with batch-leading leaves."""
    from ..problem.residual import PointLite
    T, n, m, p, N = spec.T, spec.n, spec.m, spec.p, spec.N
    dt = spec.dt
    B = traj.x.shape[0]
    BL = block_lanes
    while B % BL:
        BL //= 2
    dtype = traj.x.dtype

    trial = jax.vmap(update_traj)(traj, alpha, dtraj)
    ra = (reg_eff * alpha)[:, None, None]
    tikx = ra * dtraj.x[:, 1:]                        # [B, T, n]
    tiku = ra * dtraj.u                               # [B, T, m]

    def lane_last(a):                                 # [B, ...] -> [..., B]
        return jnp.moveaxis(a, 0, -1)

    owner = np.zeros((m,), np.int64)
    for i in range(p):
        owner[np.asarray(spec.pu[i])] = i
    if obj.Rd.ndim == 3:                              # batched obj leaves
        Rdp = obj.Rd[:, owner, np.arange(m)]          # [B, m]
        ufp = obj.uf[:, owner, np.arange(m)]
    else:
        Rdp = obj.Rd[owner, np.arange(m)]             # [m]
        ufp = obj.uf[owner, np.arange(m)]

    def pb(a, inner_ndim):
        """Per-problem leaf -> lane-last with a leading length-1 knot axis:
        [1, inner..., B].  Accepts batched ([B, inner...]) and unbatched
        ([inner...]) leaves."""
        a = jnp.asarray(a, dtype)
        if a.ndim == inner_ndim + 1:                   # batched
            return jnp.moveaxis(a, 0, -1)[None]
        return jnp.broadcast_to(a[..., None],
                                a.shape + (B,))[None]

    ins = [
        lane_last(trial.x),                            # [N, n, B]
        lane_last(trial.u),                            # [T, m, B]
        lane_last(jnp.swapaxes(trial.lam, 1, 2)),      # [T, p, n, B]
        lane_last(tikx), lane_last(tiku),
        pb(obj.Qd, 2),                                 # [1, p, n, B]
        pb(obj.xf, 2),
        pb(Rdp, 1),                                    # [1, m, B]
        pb(ufp, 1),
    ]
    s_meta = []
    for blk in gc.state_blocks:
        s_meta.append((blk.owner, tuple(int(v) for v in blk.params.pxi),
                       tuple(int(v) for v in blk.params.pxj)))
        r2 = jnp.asarray(blk.params.radius, dtype) ** 2
        r2 = jnp.broadcast_to(r2.reshape(-1), (B,))    # [B] either way
        ins.append(r2[None, None, :])                  # [1, 1, B]
        lam_b = blk.lam if blk.lam.ndim == 3 else \
            jnp.broadcast_to(blk.lam[None], (B,) + blk.lam.shape)
        mu_b = blk.mu if blk.mu.ndim == 3 else \
            jnp.broadcast_to(blk.mu[None], (B,) + blk.mu.shape)
        ins.append(lane_last(lam_b))                   # [T, 1, B]
        ins.append(lane_last(mu_b))
    c_meta = []
    for blk in gc.control_blocks:
        c_meta.append((tuple(bool(v) for v in blk.params.mask),))
        ins.append(pb(blk.params.z_max, 1))            # [1, m, B]
        ins.append(pb(blk.params.z_min, 1))
        lam_b = blk.lam if blk.lam.ndim == 3 else \
            jnp.broadcast_to(blk.lam[None], (B,) + blk.lam.shape)
        mu_b = blk.mu if blk.mu.ndim == 3 else \
            jnp.broadcast_to(blk.mu[None], (B,) + blk.mu.shape)
        ins.append(lane_last(lam_b))                   # [T, 2m, B]
        ins.append(lane_last(mu_b))

    variant = os.environ.get("ALGAMES_TRIAL_KERNEL", "horizon")
    if variant == "horizon":
        # Whole-horizon: one program per lane tile, whole arrays in VMEM.
        kernel = _make_kernel_h(T, n, m, p, N, float(dt), tuple(s_meta),
                                tuple(c_meta), BL)
        grid = (B // BL,)

        def spec_whole(x):
            shape = x.shape[:-1] + (BL,)
            nd = x.ndim

            def imap(bt):
                return (0,) * (nd - 1) + (bt,)
            return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

        in_specs = [spec_whole(x) for x in ins]
        ins_full = list(ins)

        def out_at(shape):
            nd = len(shape)

            def imap(bt):
                return (0,) * (nd - 1) + (bt,)
            return (pl.BlockSpec(shape[:-1] + (BL,), imap,
                                 memory_space=pltpu.VMEM),
                    jax.ShapeDtypeStruct(shape, dtype))
    else:
        kernel = _make_kernel(T, n, m, p, N, float(dt), tuple(s_meta),
                              tuple(c_meta), BL)
        grid = (B // BL, T)

        def spec_at(x, tmap):
            shape = (1,) + x.shape[1:-1] + (BL,)
            nd = x.ndim

            def imap(bt, t, tm=tmap):
                return (tm(t),) + (0,) * (nd - 2) + (bt,)
            return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

        t_id = lambda t: t
        t_p1 = lambda t: t + 1         # trial.x has N rows: always valid
        t_p1c = lambda t: jnp.minimum(t + 1, T - 1)
        t_0 = lambda t: 0

        in_specs = [
            spec_at(ins[0], t_id), spec_at(ins[0], t_p1),
            spec_at(ins[1], t_id), spec_at(ins[1], t_p1c),
            spec_at(ins[2], t_id), spec_at(ins[2], t_p1c),
            spec_at(ins[3], t_id), spec_at(ins[4], t_id),
            spec_at(ins[5], t_0), spec_at(ins[6], t_0),
            spec_at(ins[7], t_0), spec_at(ins[8], t_0),
        ]
        ins_full = [ins[0], ins[0], ins[1], ins[1], ins[2], ins[2],
                    ins[3], ins[4], ins[5], ins[6], ins[7], ins[8]]
        it = 9
        for _ in s_meta:
            in_specs += [spec_at(ins[it], t_0), spec_at(ins[it + 1], t_id),
                         spec_at(ins[it + 2], t_id)]
            ins_full += [ins[it], ins[it + 1], ins[it + 2]]
            it += 3
        for _ in c_meta:
            in_specs += [spec_at(ins[it], t_0), spec_at(ins[it + 1], t_0),
                         spec_at(ins[it + 2], t_id),
                         spec_at(ins[it + 3], t_id)]
            ins_full += [ins[it], ins[it + 1], ins[it + 2], ins[it + 3]]
            it += 4

        def out_at(shape):
            nd = len(shape)

            def imap(bt, t):
                return (t,) + (0,) * (nd - 2) + (bt,)
            return (pl.BlockSpec((1,) + shape[1:-1] + (BL,), imap,
                                 memory_space=pltpu.VMEM),
                    jax.ShapeDtypeStruct(shape, dtype))

    outs = [out_at((T, p, n, B)), out_at((T, m, B)), out_at((T, n, B))]
    outs += [out_at((T, 1, B)) for _ in s_meta]
    outs += [out_at((T, 2 * m, B)) for _ in c_meta]
    outs += [out_at((T, 1, B))]
    out_specs = tuple(o[0] for o in outs)
    out_shapes = tuple(o[1] for o in outs)

    res = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, interpret=interpret,
    )(*ins_full)

    rx0 = jnp.moveaxis(res[0], -1, 0)                  # [B, T, p, n]
    ru0 = jnp.moveaxis(res[1], -1, 0)
    rd = jnp.moveaxis(res[2], -1, 0)
    k = 3
    state_c = tuple(jnp.moveaxis(res[k + i], -1, 0)
                    for i in range(len(s_meta)))
    k += len(s_meta)
    control_c = tuple(jnp.moveaxis(res[k + i], -1, 0)
                      for i in range(len(c_meta)))
    k += len(c_meta)
    tn = jnp.sum(res[k], axis=(0, 1)) / spec.S         # [B]
    lite = PointLite(rx0=rx0, ru0=ru0, rd=rd, state_c=state_c,
                     control_c=control_c)
    return tn, lite


def handwritten_trial_for_problem(model, spec, obj, gc,
                                  interpret: bool = False):
    """``custom_vmap`` dispatcher for the hand-written trial kernel, or
    ``None`` when the problem structure is outside the specialization."""
    if not handwritten_supported(model, spec, obj, gc):
        return None
    return _dispatcher(model, spec, _structure_key(spec, gc), interpret)


@functools.lru_cache(maxsize=None)
def _dispatcher(model, spec, skey, interpret):

    @jax.custom_batching.custom_vmap
    def trial(traj, dtraj, alpha, reg_eff, gc, obj):
        one = jax.tree_util.tree_map(lambda a: a[None],
                                     (traj, dtraj, alpha, reg_eff))
        t1, d1, a1, r1 = one
        tn, lite = _trial_eval_handwritten(
            model, spec, obj, gc, t1, d1, a1, r1, block_lanes=1,
            interpret=interpret)
        return tn[0], jax.tree_util.tree_map(lambda a: a[0], lite)

    @trial.def_vmap
    def _rule(axis_size, in_batched, traj, dtraj, alpha, reg_eff, gc, obj):
        tb, db, ab, rb, gb, ob = in_batched

        def bc(x, f):
            return x if f else jnp.broadcast_to(x[None],
                                                (axis_size,) + x.shape)
        traj = jax.tree_util.tree_map(bc, traj, tb)
        dtraj = jax.tree_util.tree_map(bc, dtraj, db)
        alpha = bc(alpha, ab)
        reg_eff = bc(reg_eff, rb)
        gc_b = jax.tree_util.tree_map(bc, gc, gb)
        out = _trial_eval_handwritten(model, spec, obj, gc_b, traj, dtraj,
                                      alpha, reg_eff, interpret=interpret)
        return out, jax.tree_util.tree_map(lambda _: True, out)

    return trial
