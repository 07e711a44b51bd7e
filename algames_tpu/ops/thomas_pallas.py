"""Pallas TPU kernel: fused batched block-tridiagonal KKT sweep.

The XLA Schur-condensed Thomas sweep (``linear_solver.solve_tridiagonal_schur``)
is dispatch-bound: ~10 small kernels per knot x T sequential scan steps.
This kernel fuses the ENTIRE forward elimination + back substitution into two
``pallas_call``s whose grid walks (batch-tile, knot); the recursion carry
(G, y) lives in VMEM scratch that persists across the knot dimension of the
grid, so per-knot state never touches HBM.

Layout: every operand is stored lane-last — ``[..., B]`` with the batch as
the TPU lane dimension — so each per-lane small-matrix operation vectorizes
across 128 scenarios on the VPU.  Per-lane matrix products are unrolled
loops of rank-1 multiply-adds (dims n=O(12) are far below MXU tile size;
the batch provides the parallel width instead).

The reduced (u, x) system is solved by Gaussian elimination WITH row
partial pivoting (the round-4 default).  Pivot rows are selected per lane by
a max-|entry| one-hot mask and "swapped" virtually — the rank-1 update is
masked to unpivoted rows and the normalized pivot row is saved for a cheap
back substitution — so the lane-last layout never needs a scatter or a
per-lane gather.  Rationale (measured on the flagship KKT systems, f32):

* the round-3 pivoting-free Gauss-Jordan loop loses ~1e-1 relative accuracy
  at AL penalty mu=1e7 (``benchmarks/results/pallas_tpu_validation.json``):
  Gauss-Jordan's forward error scales with cond(K) ~ mu, and the stable
  pivot assignment is mu-dependent (LAPACK pivots the u columns with DYN
  rows once mu*dt^2 >> 1), so no static ordering or equilibration fixes it;
* partial-pivoted GE + back substitution tracks the pivoted LAPACK path
  (~2e-4 at mu=1e7) at ~1.5x the elimination cost.

``pivot=False`` keeps the old Jordan loop for benchmarking; the reference's
sparse LU is always pivoted (``src/problem/solver_methods.jl:87``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm(A, X):
    """Per-lane matmul: A [r, k, L] x X [k, c, L] -> [r, c, L] via unrolled
    rank-1 updates (k is a small static dim)."""
    k = A.shape[1]
    out = A[:, 0:1, :] * X[0:1, :, :]
    for b in range(1, k):
        out = out + A[:, b:b + 1, :] * X[b:b + 1, :, :]
    return out


def _reduced_solve(K, RHS, d, BL, dtype, pivot):
    """Solve the per-knot reduced system K sol = RHS per lane.

    ``pivot=True``: row-partial-pivoted GE + back substitution, all virtual:
    the pivot row is selected per LANE by a one-hot over the max-|.|
    unpivoted entry of the column, extracted by a masked reduce (no per-lane
    gather), normalized, saved for back substitution, and the rank-1 update
    is masked to the rows still in play (the -1 bias leaves the normalized
    row in place); extraction/update run only over the not-yet-eliminated
    columns.  ``pivot=False``: Gauss-Jordan without pivoting — cheaper but
    its error grows with cond(K) ~ the AL penalty mu (module docstring).
    """
    R = RHS.shape[1]
    Auga = jnp.concatenate([K, RHS], axis=1)           # [d, d+R, BL]
    if pivot:
        one = jnp.ones((), dtype)
        used = jnp.zeros((d, BL), dtype)
        rid = jax.lax.broadcasted_iota(jnp.int32, (d, BL), 0)
        rows = []
        Act = Auga
        for i in range(d):
            col = Act[:, 0, :]                         # [d, BL]
            mag = jnp.where(used > 0, -one, jnp.abs(col))
            mx = jnp.max(mag, axis=0, keepdims=True)
            # first row attaining the max (iota/min-reduce tiebreak —
            # cumsum has no Mosaic lowering)
            cand = jnp.where(mag == mx, rid, d)
            sel = jnp.min(cand, axis=0)                # [BL]
            onehot = (rid == sel[None, :]).astype(dtype)
            piv = jnp.sum(onehot * col, axis=0)        # [BL]
            row = (jnp.sum(onehot[:, None, :] * Act, axis=0)
                   / piv[None, :])                     # [d+R-i, BL]
            colv = col * (one - used) - onehot
            Act = (Act - colv[:, None, :] * row[None, :, :])[:, 1:, :]
            used = used + onehot
            rows.append(row)
        # Back substitution in variable order: rows[i][0] is the unit
        # pivot (column i), rows[i][j-i] the U entry at column j > i,
        # rows[i][d-i:] the RHS part.
        sol_rows = [None] * d
        for i in range(d - 1, -1, -1):
            acc = rows[i][d - i:]                      # [R, BL]
            for j in range(i + 1, d):
                acc = acc - rows[i][j - i][None, :] * sol_rows[j]
            sol_rows[i] = acc
        return jnp.stack(sol_rows, axis=0)             # [d, R, BL]
    # Gauss-Jordan without pivoting: the pivot row is kept in place by
    # biasing its multiplier by -1 (so the rank-1 update leaves exactly
    # the normalized row) — no scatter needed.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)
    for i in range(d):
        piv = Auga[i, i, :]
        row = Auga[i] / piv[None, :]
        onehot = (row_ids == i).astype(Auga.dtype)     # [d, 1]
        col = Auga[:, i, :] - onehot
        Auga = Auga - col[:, None, :] * row[None, :, :]
    return Auga[:, d:, :]                              # [d, R, BL]


def _make_fwd_kernel(T, n, m, p, R, BL, owner, pivot=True):
    """``owner[j]`` = player owning control index j (natural row order).

    The per-knot KKT precompute (``Kb``/``Rt`` of the round-2 design) is
    fused INTO the kernel: XLA-side it cost ~2.4 ms/chunk of layout-change
    copies + fusion intermediates (36% of device time in the r3 hlo_stats
    profile) because every [B, T, ...]-layout intermediate had to be
    re-laid-out lane-last for the custom call.  The kernel now takes the raw
    Jacobian-block leaves, each transposed lane-last exactly once.
    """
    pn = p * n
    d = n + m
    W = n + m + pn
    owner = np.asarray(owner)

    def kernel(Q_ref, Ub_ref, Bm_ref, A_ref, AT_ref, b_ref,
               G_out, y_out, G_sc, y_sc):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            G_sc[...] = jnp.zeros(G_sc.shape, G_sc.dtype)
            y_sc[...] = jnp.zeros(y_sc.shape, y_sc.dtype)

        Q = Q_ref[0]           # [p, n, n, BL]
        Ub = Ub_ref[0]         # [m, m, BL]
        Bm = Bm_ref[0]         # [n, m, BL]
        At = A_ref[0]          # [n, n, BL]  A_t (content at t=0 only ever
        #                        multiplies the zeroed carries — no gate)
        dtype = Q.dtype
        # A_{t+1}^T, zero at the final knot (the clamped index map would
        # otherwise re-read A_{T-1}).
        gate = jnp.where(t < T - 1, 1.0, 0.0).astype(dtype)
        At1T = AT_ref[0] * gate                            # [n, n, BL]
        b = b_ref[0]           # [W, BL]
        a = b[:pn]             # [pn, BL]
        c = b[pn:pn + m]       # [m, BL]
        d0 = b[pn + m:]        # [n, BL]
        G_prev = G_sc[...]     # [n, pn, BL]  (x rows of the carry only)
        y_prev = y_sc[...]     # [n, BL]

        # ---- per-knot KKT precompute (fused; round-2 did this in XLA) ----
        # Qsel[r] = Q[owner[r]]: static row gather of each control row's
        # player Hessian block.
        Qsel = jnp.concatenate(
            [Q[int(owner[r])][None] for r in range(m)], axis=0)  # [m,n,n,BL]
        # BtQ[r, c] = sum_k B[k, r] Q_owner(r)[k, c]   (statu-x coupling)
        BtQ = Bm[0][:, None, :] * Qsel[:, 0]
        for k in range(1, n):
            BtQ = BtQ + Bm[k][:, None, :] * Qsel[:, k]     # [m, n, BL]
        # bd[r, :] = sum_k B[k, r] At1T[k, :]; block-diagonal embed by the
        # static owner mask, segment-concat along columns (no scatter).
        bd = Bm[0][:, None, :] * At1T[0][None]
        for k in range(1, n):
            bd = bd + Bm[k][:, None, :] * At1T[k][None]    # [m, n, BL]
        # (static masks materialize as captured constants, which pallas
        # rejects — build the block-diagonal embed row-by-row instead)
        cG = jnp.concatenate(
            [jnp.concatenate(
                [bd[r:r + 1] if owner[r] == i else bd[r:r + 1] * 0.0
                 for r in range(m)], axis=0)
             for i in range(p)], axis=1)                   # [m, pn, BL]
        # cy[r] = c[r] + sum_k B[k, r] a_owner(r)[k]
        Asel = jnp.concatenate(
            [a[int(owner[r]) * n:(int(owner[r]) + 1) * n][:, None, :]
             for r in range(m)], axis=1)                   # [n, m, BL]
        cy = c + jnp.sum(Bm * Asel, axis=0)                # [m, BL]
        Rt = jnp.concatenate([cG, cy[:, None, :]], axis=1)  # [m, R, BL]
        ri = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        neg_eye = -(ri == ci).astype(dtype)[:, :, None]

        # F = -At @ G_prev  -> [n, pn, BL]
        F = -_mm(At, G_prev)
        # FQ = sum_i F_i Q_i
        FQ = _mm(F[:, 0:n, :], Q[0])
        for i in range(1, p):
            FQ = FQ + _mm(F[:, i * n:(i + 1) * n, :], Q[i])

        # K rows: [statu (m) | dyn (n)], cols: [u (m) | x (n)]  (u-first!)
        K = jnp.concatenate([
            jnp.concatenate([Ub, BtQ], axis=1),
            jnp.concatenate([Bm, neg_eye + FQ], axis=1)], axis=0)

        # RHS rows (statu, dyn): top Rt; bottom dG | dy.
        dG = _mm(F[:, 0:n, :], At1T)
        dGs = [dG]
        for i in range(1, p):
            dGs.append(_mm(F[:, i * n:(i + 1) * n, :], At1T))
        dG = jnp.concatenate(dGs, axis=1)                  # [n, pn, BL]
        Aty = _mm(At, y_prev[:, None, :])[:, 0, :]         # [n, BL]
        Fa = _mm(F, a[:, None, :])[:, 0, :]                # [n, BL]
        dy = d0 - Aty + Fa
        RHS = jnp.concatenate(
            [Rt, jnp.concatenate([dG, dy[:, None, :]], axis=1)], axis=0)

        sol = _reduced_solve(K, RHS, d, BL, dtype, pivot)  # [d, R, BL]
        Uu = sol[:m]                                       # u block (first)
        X = sol[m:]                                        # x block

        # lam rows of the sweep are NOT materialized: lam_t depends on the
        # solved (x, u) and lam_{t+1} in closed form
        #   lam_{i,t} = Q_i x_t + A_{t+1}^T lam_{i,t+1} - a_i
        # so the backward pass reconstructs it as two vector products per
        # player instead of the fwd pass solving p Q_i-by-R-column products
        # (~1/3 of the fwd kernel's flops in the round-3 profile) and the
        # [pn, pn] lam block of G never touching HBM (2/3 of G's bytes).
        G_t = jnp.concatenate([X[:, :pn], Uu[:, :pn]], axis=0)   # [d, pn]
        y_t = jnp.concatenate([X[:, pn], Uu[:, pn]], axis=0)     # [d]
        G_sc[...] = X[:, :pn]     # only the x rows feed the next knot's F
        y_sc[...] = X[:, pn]
        G_out[0] = G_t
        y_out[0] = y_t

    return kernel


def _make_bwd_kernel(T, n, m, p, BL):
    pn = p * n
    W = n + m + pn

    def kernel(G_ref, yhat_ref, Q_ref, AT_ref, b_ref, y_out, lam_sc):
        t = pl.program_id(1)           # walks 0..T-1 mapped to knots T-1..0

        @pl.when(t == 0)
        def _():
            lam_sc[...] = jnp.zeros(lam_sc.shape, lam_sc.dtype)

        G = G_ref[0]                   # [d, pn, BL]  (x, u) rows only
        yhat = yhat_ref[0]             # [d, BL]
        Q = Q_ref[0]                   # [p, n, n, BL]
        dtype = Q.dtype
        # A_{knot+1}^T, zero at the final knot (grid step 0 = knot T-1).
        gate = jnp.where(t > 0, 1.0, 0.0).astype(dtype)
        At1T = AT_ref[0] * gate        # [n, n, BL]
        a = b_ref[0][:pn]              # [pn, BL]
        lam_next = lam_sc[...]         # [pn, BL]

        xu = yhat - _mm(G, lam_next[:, None, :])[:, 0, :]   # [d, BL]
        x = xu[:n]
        # lam_{i,t} = Q_i x_t + A_{t+1}^T lam_{i,t+1} - a_i  (closed form,
        # the same linear combination the fwd lam rows of G used to encode).
        lams = []
        for i in range(p):
            li = _mm(Q[i], x[:, None, :])[:, 0, :]          # [n, BL]
            li = li + _mm(At1T,
                          lam_next[i * n:(i + 1) * n][:, None, :])[:, 0, :]
            lams.append(li - a[i * n:(i + 1) * n])
        lam_t = jnp.concatenate(lams, axis=0)               # [pn, BL]
        lam_sc[...] = lam_t
        y_out[0] = jnp.concatenate([xu, lam_t], axis=0)     # [W, BL]

    return kernel


def _make_fwd_kernel_sq(T, n, m, p, R, BL, owner, w_owner, pivot=True):
    """Structured-Q forward kernel: the statx Hessian arrives as
    ``diag(q_i) + sum_k w_k w_k^T`` (``residual.StructuredQ``), so the
    B^T Q and F Q contractions are diag-multiplies plus one dot+axpy per w
    vector instead of dense [n, n] products, and the dense Q tensor never
    exists (neither in HBM nor in the lane-last relayout)."""
    pn = p * n
    d = n + m
    owner = np.asarray(owner)
    NW = len(w_owner)

    def kernel(q_ref, wv_ref, Ub_ref, Bm_ref, A_ref, AT_ref, b_ref,
               G_out, y_out, G_sc, y_sc):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            G_sc[...] = jnp.zeros(G_sc.shape, G_sc.dtype)
            y_sc[...] = jnp.zeros(y_sc.shape, y_sc.dtype)

        q = q_ref[0]           # [p, n, BL]
        wv = wv_ref[0]         # [max(NW,1), n, BL]
        Ub = Ub_ref[0]         # [m, m, BL]
        Bm = Bm_ref[0]         # [n, m, BL]
        At = A_ref[0]          # [n, n, BL]
        dtype = q.dtype
        gate = jnp.where(t < T - 1, 1.0, 0.0).astype(dtype)
        At1T = AT_ref[0] * gate                            # [n, n, BL]
        b = b_ref[0]
        a = b[:pn]
        c = b[pn:pn + m]
        d0 = b[pn + m:]
        G_prev = G_sc[...]     # [n, pn, BL]
        y_prev = y_sc[...]     # [n, BL]

        # BtQ[r] = B_col_r * q_owner(r) (+ rank-1 terms), elementwise.
        btq_rows = []
        for r in range(m):
            o = int(owner[r])
            acc = Bm[:, r, :] * q[o]                       # [n, BL]
            for k in range(NW):
                if w_owner[k] == o:
                    # unrolled dot (Mosaic rejects multi_reduction over a
                    # sublane dim of an offset slice)
                    prod = Bm[:, r, :] * wv[k]             # [n, BL]
                    bw = prod[0]
                    for j in range(1, n):
                        bw = bw + prod[j]                  # [BL]
                    acc = acc + bw[None, :] * wv[k]
            btq_rows.append(acc[None])
        BtQ = jnp.concatenate(btq_rows, axis=0)            # [m, n, BL]

        bd = Bm[0][:, None, :] * At1T[0][None]
        for k in range(1, n):
            bd = bd + Bm[k][:, None, :] * At1T[k][None]    # [m, n, BL]
        cG = jnp.concatenate(
            [jnp.concatenate(
                [bd[r:r + 1] if owner[r] == i else bd[r:r + 1] * 0.0
                 for r in range(m)], axis=0)
             for i in range(p)], axis=1)                   # [m, pn, BL]
        Asel = jnp.concatenate(
            [a[int(owner[r]) * n:(int(owner[r]) + 1) * n][:, None, :]
             for r in range(m)], axis=1)                   # [n, m, BL]
        cy = c + jnp.sum(Bm * Asel, axis=0)
        Rt = jnp.concatenate([cG, cy[:, None, :]], axis=1)  # [m, R, BL]
        ri = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        neg_eye = -(ri == ci).astype(dtype)[:, :, None]

        F = -_mm(At, G_prev)                               # [n, pn, BL]
        # FQ = sum_i F_i diag(q_i) + sum_k (F_{ow k} w_k) w_k^T
        FQ = F[:, 0:n, :] * q[0][None, :, :]
        for i in range(1, p):
            FQ = FQ + F[:, i * n:(i + 1) * n, :] * q[i][None, :, :]
        for k in range(NW):
            o = w_owner[k]
            Fw = _mm(F[:, o * n:(o + 1) * n, :],
                     wv[k][:, None, :])[:, 0, :]           # [n, BL]
            FQ = FQ + Fw[:, None, :] * wv[k][None, :, :]

        K = jnp.concatenate([
            jnp.concatenate([Ub, BtQ], axis=1),
            jnp.concatenate([Bm, neg_eye + FQ], axis=1)], axis=0)

        dG = _mm(F[:, 0:n, :], At1T)
        dGs = [dG]
        for i in range(1, p):
            dGs.append(_mm(F[:, i * n:(i + 1) * n, :], At1T))
        dG = jnp.concatenate(dGs, axis=1)                  # [n, pn, BL]
        Aty = _mm(At, y_prev[:, None, :])[:, 0, :]
        Fa = _mm(F, a[:, None, :])[:, 0, :]
        dy = d0 - Aty + Fa
        RHS = jnp.concatenate(
            [Rt, jnp.concatenate([dG, dy[:, None, :]], axis=1)], axis=0)

        sol = _reduced_solve(K, RHS, d, BL, dtype, pivot)
        Uu = sol[:m]
        X = sol[m:]
        G_t = jnp.concatenate([X[:, :pn], Uu[:, :pn]], axis=0)
        y_t = jnp.concatenate([X[:, pn], Uu[:, pn]], axis=0)
        G_sc[...] = X[:, :pn]
        y_sc[...] = X[:, pn]
        G_out[0] = G_t
        y_out[0] = y_t

    return kernel


def _make_bwd_kernel_sq(T, n, m, p, BL, w_owner):
    pn = p * n
    W = n + m + pn
    NW = len(w_owner)

    def kernel(G_ref, yhat_ref, q_ref, wv_ref, AT_ref, b_ref, y_out,
               lam_sc):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            lam_sc[...] = jnp.zeros(lam_sc.shape, lam_sc.dtype)

        G = G_ref[0]
        yhat = yhat_ref[0]
        q = q_ref[0]           # [p, n, BL]
        wv = wv_ref[0]         # [max(NW,1), n, BL]
        dtype = q.dtype
        gate = jnp.where(t > 0, 1.0, 0.0).astype(dtype)
        At1T = AT_ref[0] * gate
        a = b_ref[0][:pn]
        lam_next = lam_sc[...]

        xu = yhat - _mm(G, lam_next[:, None, :])[:, 0, :]
        x = xu[:n]
        # lam_i = diag(q_i) x + sum_{ow k = i} (w_k . x) w_k
        #         + A_{t+1}^T lam_{i,t+1} - a_i
        lams = []
        for i in range(p):
            li = q[i] * x
            for k in range(NW):
                if w_owner[k] == i:
                    prod = wv[k] * x                       # [n, BL]
                    wx = prod[0]
                    for j in range(1, n):
                        wx = wx + prod[j]                  # [BL]
                    li = li + wx[None, :] * wv[k]
            li = li + _mm(At1T,
                          lam_next[i * n:(i + 1) * n][:, None, :])[:, 0, :]
            lams.append(li - a[i * n:(i + 1) * n])
        lam_t = jnp.concatenate(lams, axis=0)
        lam_sc[...] = lam_t
        y_out[0] = jnp.concatenate([xu, lam_t], axis=0)    # [W, BL]

    return kernel


def solve_thomas_pallas(spec, jb, b_knots, block_lanes: int = 128,
                        interpret: bool = False, pivot: bool = True):
    """Drop-in replacement for ``solve_tridiagonal_schur`` as two fused
    Pallas kernels, batched: ``jb`` leaves and ``b_knots`` must carry a
    leading batch axis [B, ...].  Returns [B, S].

    Heterogeneous per-player mi (VERDICT r3 #4) is handled by pad-and-mask:
    every player's control block is padded to max(mi) (player-major order)
    with identity diagonal rows and zero couplings, so the padded unknowns
    are exactly decoupled; the kernel is oblivious and the result is
    gathered back to natural control order (cf. the reference's
    shape-agnostic sparse LU, ``src/core/newton_core.jl:40-89``).
    """
    T, n, m, p = spec.T, spec.n, spec.m, spec.p
    pn, W = p * n, spec.W
    B = b_knots.shape[0]
    BL = min(block_lanes, B)
    assert B % BL == 0, "batch must be divisible by the lane block"
    dtype = jb.A.dtype
    if spec.homogeneous:
        mk = m                               # kernel-visible control width
        Bm_in, Ub_in, b_in = jb.B, jb.Ublk, b_knots
        owner = np.zeros((m,), np.int32)
        for i in range(p):
            owner[np.asarray(spec.pu[i])] = i
    else:
        mmax = max(spec.mi)
        mk = p * mmax
        idx = np.full((mk,), m, np.int64)    # m = virtual zero column
        pad_mask = np.zeros((mk,), np.float64)
        for i in range(p):
            idx[i * mmax:i * mmax + spec.mi[i]] = np.asarray(spec.pu[i])
            pad_mask[i * mmax + spec.mi[i]:(i + 1) * mmax] = 1.0
        owner = (np.arange(mk) // mmax).astype(np.int32)
        Bm_in = jnp.concatenate(
            [jb.B, jnp.zeros((B, T, n, 1), dtype)], axis=3)[:, :, :, idx]
        Ub_in = (jnp.pad(jb.Ublk, ((0, 0), (0, 0), (0, 1), (0, 1)))
                 [:, :, idx][:, :, :, idx]
                 + jnp.asarray(np.diag(pad_mask), dtype))
        c_pad = jnp.pad(b_knots[:, :, pn:pn + m],
                        ((0, 0), (0, 0), (0, 1)))[:, :, idx]
        b_in = jnp.concatenate(
            [b_knots[:, :, :pn], c_pad, b_knots[:, :, pn + m:]], axis=2)
    d = n + mk
    R = pn + 1

    # ---- lane-last relayout of the RAW leaves (the only XLA-side work) ---
    # All per-knot KKT precompute (Kb/Rt/BtQ/cG/cy of the round-2 design)
    # happens inside the kernel; XLA's job is reduced to one layout
    # transpose per leaf, ~40% fewer bytes than transposing the precomputed
    # tensors and with no fusion intermediates to re-lay-out.
    A, Qb = jb.A, jb.Qblk                          # [B, T, ...]
    Wk = n + mk + pn                               # kernel-row width
    ins = [
        jnp.transpose(Qb, (1, 2, 3, 4, 0)),        # [T, p, n, n, B]
        jnp.transpose(Ub_in, (1, 2, 3, 0)),        # [T, mk, mk, B]
        jnp.transpose(Bm_in, (1, 2, 3, 0)),        # [T, n, mk, B]
        jnp.transpose(A, (1, 2, 3, 0)),            # [T, n, n, B]   A_t
        jnp.transpose(A, (1, 3, 2, 0)),            # [T, n, n, B]   A_t^T
        jnp.transpose(b_in, (1, 2, 0)),            # [T, Wk, B]
    ]

    fwd_kernel = _make_fwd_kernel(T, n, mk, p, R, BL, owner, pivot=pivot)
    grid = (B // BL, T)

    def in_spec(x, shift_clamp=False):
        # block: [1 knot, ..., BL lanes]
        shape = (1,) + x.shape[1:-1] + (BL,)
        nd = x.ndim

        def imap(bt, t):
            tt = jnp.minimum(t + 1, T - 1) if shift_clamp else t
            return (tt,) + (0,) * (nd - 2) + (bt,)
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    in_specs = [in_spec(ins[0]), in_spec(ins[1]), in_spec(ins[2]),
                in_spec(ins[3]),
                in_spec(ins[4], shift_clamp=True),   # A_{t+1}^T
                in_spec(ins[5])]

    G, yhat = pl.pallas_call(
        fwd_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, d, pn, BL), lambda bt, t: (t, 0, 0, bt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, BL), lambda bt, t: (t, 0, bt),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, d, pn, B), dtype),
            jax.ShapeDtypeStruct((T, d, B), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, pn, BL), dtype),
            pltpu.VMEM((n, BL), dtype),
        ],
        interpret=interpret,
    )(*ins)

    bwd_kernel = _make_bwd_kernel(T, n, mk, p, BL)

    def rev_spec(x, shift_clamp=False):
        shape = (1,) + x.shape[1:-1] + (BL,)
        nd = x.ndim

        def imap(bt, t):
            knot = T - 1 - t
            tt = jnp.minimum(knot + 1, T - 1) if shift_clamp else knot
            return (tt,) + (0,) * (nd - 2) + (bt,)
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    ys = pl.pallas_call(
        bwd_kernel,
        grid=grid,
        in_specs=[
            rev_spec(G), rev_spec(yhat),
            rev_spec(ins[0]),                      # Q
            rev_spec(ins[4], shift_clamp=True),    # A_{knot+1}^T
            rev_spec(ins[5]),                      # b (a rows)
        ],
        out_specs=pl.BlockSpec((1, Wk, BL), lambda bt, t: (T - 1 - t, 0, bt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, Wk, B), dtype),
        scratch_shapes=[pltpu.VMEM((pn, BL), dtype)],
        interpret=interpret,
    )(G, yhat, ins[0], ins[4], ins[5])

    if not spec.homogeneous:
        # Un-pad: gather the real controls back into natural order.
        mmax = mk // p
        nat2pm = np.zeros((m,), np.int64)
        for i in range(p):
            nat2pm[np.asarray(spec.pu[i])] = i * mmax + np.arange(spec.mi[i])
        cols = np.concatenate([np.arange(n), n + nat2pm,
                               n + mk + np.arange(pn)])
        ys = ys[:, cols]
    # [T, W, B] -> [B, T*W]
    return jnp.transpose(ys, (2, 0, 1)).reshape(B, T * W)


def solve_thomas_pallas_structured(spec, sq, b_knots, w_owner,
                                   block_lanes: int = 128,
                                   interpret: bool = False,
                                   pivot: bool = True):
    """Structured-Q variant of :func:`solve_thomas_pallas` — consumes
    ``residual.StructuredQ`` leaves with a leading batch axis; the dense Q
    tensor is never formed.  Homogeneous specs only (the hetero pad path
    uses the dense kernel)."""
    assert spec.homogeneous
    T, n, m, p = spec.T, spec.n, spec.m, spec.p
    pn, W, d = p * n, spec.W, spec.n + spec.m
    R = pn + 1
    B = b_knots.shape[0]
    BL = min(block_lanes, B)
    assert B % BL == 0, "batch must be divisible by the lane block"
    dtype = sq.A.dtype
    owner = np.zeros((m,), np.int32)
    for i in range(p):
        owner[np.asarray(spec.pu[i])] = i
    NW = sq.wv.shape[2]
    assert NW == len(w_owner)
    wv_in = (sq.wv if NW > 0
             else jnp.zeros((B, T, 1, n), dtype))          # dummy ref

    ins = [
        jnp.transpose(sq.qdiag, (1, 2, 3, 0)),     # [T, p, n, B]
        jnp.transpose(wv_in, (1, 2, 3, 0)),        # [T, NW|1, n, B]
        jnp.transpose(sq.Ublk, (1, 2, 3, 0)),      # [T, m, m, B]
        jnp.transpose(sq.B, (1, 2, 3, 0)),         # [T, n, m, B]
        jnp.transpose(sq.A, (1, 2, 3, 0)),         # [T, n, n, B]   A_t
        jnp.transpose(sq.A, (1, 3, 2, 0)),         # [T, n, n, B]   A_t^T
        jnp.transpose(b_knots, (1, 2, 0)),         # [T, W, B]
    ]

    fwd_kernel = _make_fwd_kernel_sq(T, n, m, p, R, BL, owner,
                                     tuple(w_owner), pivot=pivot)
    grid = (B // BL, T)

    def in_spec(x, shift_clamp=False):
        shape = (1,) + x.shape[1:-1] + (BL,)
        nd = x.ndim

        def imap(bt, t):
            tt = jnp.minimum(t + 1, T - 1) if shift_clamp else t
            return (tt,) + (0,) * (nd - 2) + (bt,)
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    in_specs = [in_spec(x) for x in ins[:5]] + [
        in_spec(ins[5], shift_clamp=True), in_spec(ins[6])]

    G, yhat = pl.pallas_call(
        fwd_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, d, pn, BL), lambda bt, t: (t, 0, 0, bt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, BL), lambda bt, t: (t, 0, bt),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, d, pn, B), dtype),
            jax.ShapeDtypeStruct((T, d, B), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, pn, BL), dtype),
            pltpu.VMEM((n, BL), dtype),
        ],
        interpret=interpret,
    )(*ins)

    bwd_kernel = _make_bwd_kernel_sq(T, n, m, p, BL, tuple(w_owner))

    def rev_spec(x, shift_clamp=False):
        shape = (1,) + x.shape[1:-1] + (BL,)
        nd = x.ndim

        def imap(bt, t):
            knot = T - 1 - t
            tt = jnp.minimum(knot + 1, T - 1) if shift_clamp else knot
            return (tt,) + (0,) * (nd - 2) + (bt,)
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    ys = pl.pallas_call(
        bwd_kernel,
        grid=grid,
        in_specs=[
            rev_spec(G), rev_spec(yhat),
            rev_spec(ins[0]),                      # qdiag
            rev_spec(ins[1]),                      # wv
            rev_spec(ins[5], shift_clamp=True),    # A_{knot+1}^T
            rev_spec(ins[6]),                      # b (a rows)
        ],
        out_specs=pl.BlockSpec((1, W, BL), lambda bt, t: (T - 1 - t, 0, bt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, W, B), dtype),
        scratch_shapes=[pltpu.VMEM((pn, BL), dtype)],
        interpret=interpret,
    )(G, yhat, ins[0], ins[1], ins[5], ins[6])

    return jnp.transpose(ys, (2, 0, 1)).reshape(B, T * W)


@functools.lru_cache(maxsize=None)
def thomas_pallas_structured_for_spec(spec, w_owner, interpret: bool = False,
                                      pivot: bool = True):
    """custom_vmap dispatcher for the structured-Q kernel (see
    :func:`thomas_pallas_for_spec`)."""

    @jax.custom_batching.custom_vmap
    def solve(sq, b):
        sq1 = jax.tree_util.tree_map(lambda x: x[None], sq)
        return solve_thomas_pallas_structured(
            spec, sq1, b[None], w_owner, block_lanes=1,
            interpret=interpret, pivot=pivot)[0]

    @solve.def_vmap
    def _rule(axis_size, in_batched, sq, b):
        sq_flags, b_flag = in_batched

        def bcast(x, flag):
            return x if flag else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape)

        sq = jax.tree_util.tree_map(bcast, sq, sq_flags)
        b = bcast(b, b_flag)
        bl = _largest_block(axis_size)
        out = solve_thomas_pallas_structured(
            spec, sq, b, w_owner, block_lanes=bl, interpret=interpret,
            pivot=pivot)
        return out, True

    return solve


def _largest_block(B: int, cap: int = 128) -> int:
    """Lane-block size: Mosaic requires the lane dim of a block to be a
    multiple of 128 or the full array dim, so pick the largest divisor of B
    that is a multiple of 128, else the whole batch."""
    for bl in range(cap * (B // cap), 0, -cap):
        if B % bl == 0:
            return bl
    return B


@functools.lru_cache(maxsize=None)
def thomas_pallas_for_spec(spec, interpret: bool = False, pivot: bool = True):
    """Per-sample Thomas solve that dispatches to the lane-batched Pallas
    kernel under ``vmap`` (``jax.custom_batching.custom_vmap``): the solver
    stays written per-scenario, while batched solves hit the fused kernel
    with the batch as the TPU lane dimension."""

    @jax.custom_batching.custom_vmap
    def solve(jb, b):
        jb1 = jax.tree_util.tree_map(lambda x: x[None], jb)
        return solve_thomas_pallas(spec, jb1, b[None], block_lanes=1,
                                   interpret=interpret, pivot=pivot)[0]

    @solve.def_vmap
    def _rule(axis_size, in_batched, jb, b):
        # Broadcast any unbatched leaves to the batch axis.
        jb_flags, b_flag = in_batched

        def bcast(x, flag):
            return x if flag else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape)

        jb = jax.tree_util.tree_map(bcast, jb, jb_flags)
        b = bcast(b, b_flag)
        bl = _largest_block(axis_size)
        out = solve_thomas_pallas(spec, jb, b, block_lanes=bl,
                                  interpret=interpret, pivot=pivot)
        return out, True

    return solve
