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

The reduced (u, x) system is solved by Gaussian elimination WITHOUT row
pivoting in the (u-first, x-second) ordering: the u-block pivots are the
strictly positive regularized control-Hessian diagonal, and the trailing
x-block pivots come from the dynamics Schur complement ``-I + O(...)``.
This is the pivoting-free design risk called out in SURVEY.md §7 (hard part
1); it is validated against the pivoted XLA path across the full AL penalty
schedule in tests, and callers can always fall back to ``method="schur"``.
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


def _make_fwd_kernel(T, n, m, p, R, BL):
    pn = p * n
    d = n + m
    W = n + m + pn

    def kernel(Q_ref, Kb_ref, Rt_ref, a_ref, d0_ref, At_ref, At1T_ref,
               G_out, y_out, G_sc, y_sc):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            G_sc[...] = jnp.zeros(G_sc.shape, G_sc.dtype)
            y_sc[...] = jnp.zeros(y_sc.shape, y_sc.dtype)

        Q = Q_ref[0]           # [p, n, n, BL]
        Kb = Kb_ref[0]         # [d, d, BL]   rows (u, x-dyn), cols (u, x)
        Rt = Rt_ref[0]         # [m, R, BL]
        a = a_ref[0]           # [pn, BL]
        d0 = d0_ref[0]         # [n, BL]
        At = At_ref[0]         # [n, n, BL]
        At1T = At1T_ref[0]     # [n, n, BL]
        G_prev = G_sc[...]     # [W, pn, BL]
        y_prev = y_sc[...]     # [W, BL]

        # F = -At @ G_prev[:n]  -> [n, pn, BL]
        F = -_mm(At, G_prev[:n])
        # FQ = sum_i F_i Q_i
        FQ = _mm(F[:, 0:n, :], Q[0])
        for i in range(1, p):
            FQ = FQ + _mm(F[:, i * n:(i + 1) * n, :], Q[i])

        # K rows: [statu (m) | dyn (n)], cols: [u (m) | x (n)]  (u-first!)
        # Kb comes in as rows (statu, dyn), cols (u, x) with the -I already
        # in the dyn-x block; add FQ there.  (No scatter ops in Pallas TPU —
        # build via concat.)
        K = jnp.concatenate([
            Kb[:m],
            jnp.concatenate([Kb[m:, :m], Kb[m:, m:] + FQ], axis=1)], axis=0)

        # RHS rows (statu, dyn): top Rt; bottom dG | dy.
        dG = _mm(F[:, 0:n, :], At1T)
        dGs = [dG]
        for i in range(1, p):
            dGs.append(_mm(F[:, i * n:(i + 1) * n, :], At1T))
        dG = jnp.concatenate(dGs, axis=1)                  # [n, pn, BL]
        Aty = _mm(At, y_prev[:n][:, None, :])[:, 0, :]     # [n, BL]
        Fa = _mm(F, a[:, None, :])[:, 0, :]                # [n, BL]
        dy = d0 - Aty + Fa
        RHS = jnp.concatenate(
            [Rt, jnp.concatenate([dG, dy[:, None, :]], axis=1)], axis=0)

        # Gaussian elimination without pivoting on [d, d+R, BL].  The pivot
        # row is kept in place by biasing its multiplier by -1 (so the rank-1
        # update leaves exactly the normalized row) — no scatter needed.
        Auga = jnp.concatenate([K, RHS], axis=1)           # [d, d+R, BL]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)
        for i in range(d):
            piv = Auga[i, i, :]
            row = Auga[i] / piv[None, :]
            onehot = (row_ids == i).astype(Auga.dtype)     # [d, 1]
            col = Auga[:, i, :] - onehot
            Auga = Auga - col[:, None, :] * row[None, :, :]
        sol = Auga[:, d:, :]                               # [d, R, BL]
        Uu = sol[:m]                                       # u block (first)
        X = sol[m:]                                        # x block

        # lam_i = Q_i x - a_i columns; a-columns: blockdiag(At1T) for the G
        # part, ``a`` for the y column.  Segment-wise concat (no scatter).
        lams = []
        for i in range(p):
            li = _mm(Q[i], X)                              # [n, R, BL]
            segs = []
            if i > 0:
                segs.append(li[:, :i * n])
            segs.append(li[:, i * n:(i + 1) * n] - At1T)
            if i < p - 1:
                segs.append(li[:, (i + 1) * n:pn])
            segs.append(li[:, pn:] - a[i * n:(i + 1) * n][:, None, :])
            lams.append(jnp.concatenate(segs, axis=1))
        lam = jnp.concatenate(lams, axis=0)                # [pn, R, BL]

        G_t = jnp.concatenate([X[:, :pn], Uu[:, :pn], lam[:, :pn]], axis=0)
        y_t = jnp.concatenate([X[:, pn], Uu[:, pn], lam[:, pn]], axis=0)
        G_sc[...] = G_t
        y_sc[...] = y_t
        G_out[0] = G_t
        y_out[0] = y_t

    return kernel, W, pn


def _make_bwd_kernel(T, n, m, p, BL):
    pn = p * n
    W = n + m + pn

    def kernel(G_ref, yhat_ref, y_out, y_sc):
        t = pl.program_id(1)           # walks 0..T-1 mapped to knots T-1..0

        @pl.when(t == 0)
        def _():
            y_sc[...] = jnp.zeros(y_sc.shape, y_sc.dtype)

        G = G_ref[0]                   # [W, pn, BL]
        yhat = yhat_ref[0]             # [W, BL]
        y_next = y_sc[...]             # [W, BL]
        y_t = yhat - _mm(G, y_next[n + m:][:, None, :])[:, 0, :]
        y_sc[...] = y_t
        y_out[0] = y_t

    return kernel


def solve_thomas_pallas(spec, jb, b_knots, block_lanes: int = 128,
                        interpret: bool = False):
    """Drop-in replacement for ``solve_tridiagonal_schur`` as two fused
    Pallas kernels, batched: ``jb`` leaves and ``b_knots`` must carry a
    leading batch axis [B, ...].  Returns [B, S]."""
    if not spec.homogeneous:
        raise ValueError(
            "method='pallas' stacks per-player [p, mi] control tensors and "
            "requires homogeneous player dimensions; use method='tridiag', "
            "'cr', or 'dense' for mixed per-player mi/ni")
    T, n, m, p = spec.T, spec.n, spec.m, spec.p
    pn, W, d = p * n, spec.W, spec.n + spec.m
    R = pn + 1
    B = b_knots.shape[0]
    BL = min(block_lanes, B)
    assert B % BL == 0, "batch must be divisible by the lane block"
    dtype = jb.A.dtype
    pu = np.stack([np.asarray(spec.pu[i]) for i in range(p)])

    # ---- batched precomputation (XLA), laid out lane-last ----------------
    A, Bm, Qb, Ub = jb.A, jb.B, jb.Qblk, jb.Ublk   # [B, T, ...]
    zero_n = jnp.zeros((B, 1, n, n), dtype)
    Asub = jnp.concatenate([zero_n, A[:, 1:]], axis=1)
    AsupT = jnp.concatenate([jnp.transpose(A[:, 1:], (0, 1, 3, 2)), zero_n],
                            axis=1)
    Bp = Bm[:, :, :, pu.reshape(-1)].reshape(B, T, n, p, -1)
    Bp = jnp.transpose(Bp, (0, 1, 3, 2, 4))                    # [B,T,p,n,mi]
    # Contractions over the small state dim n as elementwise VPU reduces:
    # einsum dots here lower to bf16 MXU matmuls + layout-change copies.
    BtQ_p = jnp.sum(Bp[..., None] * Qb[:, :, :, :, None, :], axis=3)
    # Row embeddings by STATIC permutation gather (scatter .at[pu].set is a
    # pathologically slow partial-tile VMEM write on TPU — it dominated the
    # round-1 device profile at ~66% of solve time).
    perm = pu.reshape(-1)                     # player-major row order
    inv = np.argsort(perm)                    # natural row -> stacked pos
    BtQ = BtQ_p.reshape(B, T, m, n)[:, :, inv, :]
    eye_n = jnp.eye(n, dtype=dtype)
    eye_p = jnp.asarray(np.eye(p), dtype)
    # Kb rows (statu, dyn), cols (u, x): u-first ordering for pivoting-free GE.
    Kb = jnp.concatenate([
        jnp.concatenate([Ub, BtQ], axis=3),
        jnp.concatenate([Bm, jnp.broadcast_to(-eye_n, (B, T, n, n))], axis=3),
    ], axis=2)                                                 # [B,T,d,d]

    a_all = b_knots[:, :, :pn]
    c_all = b_knots[:, :, pn:pn + m]
    d_all = b_knots[:, :, pn + m:]
    cG_p = jnp.sum(Bp[..., None] * AsupT[:, :, None, :, None, :],
                   axis=3)                                       # [B,T,p,mi,n]
    # Block-diagonal embed via identity mask, then the same row permutation.
    cG_bd = (cG_p[:, :, :, :, None, :]
             * eye_p[None, None, :, None, :, None])           # [B,T,p,mi,p,n]
    cG = cG_bd.reshape(B, T, m, pn)[:, :, inv, :]
    cy_add = jnp.sum(Bp * a_all.reshape(B, T, p, n)[..., None],
                     axis=3)                                  # [B,T,p,mi]
    cy = c_all + cy_add.reshape(B, T, m)[:, :, inv]
    Rt = jnp.concatenate([cG, cy[..., None]], axis=3)          # [B,T,m,R]

    def lane_last(x):
        # [B, T, ...] -> [T, ..., B]
        perm = (1,) + tuple(range(2, x.ndim)) + (0,)
        return jnp.transpose(x, perm)

    ins = [lane_last(x) for x in
           (Qb, Kb, Rt, a_all, d_all, Asub, AsupT)]

    fwd_kernel, W_, pn_ = _make_fwd_kernel(T, n, m, p, R, BL)
    grid = (B // BL, T)

    def in_spec(x):
        # block: [1 knot, ..., BL lanes]
        shape = (1,) + x.shape[1:-1] + (BL,)
        nd = x.ndim

        def imap(bt, t):
            return (t,) + (0,) * (nd - 2) + (bt,)
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    G, yhat = pl.pallas_call(
        fwd_kernel,
        grid=grid,
        in_specs=[in_spec(x) for x in ins],
        out_specs=(
            pl.BlockSpec((1, W, pn, BL), lambda bt, t: (t, 0, 0, bt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, BL), lambda bt, t: (t, 0, bt),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, W, pn, B), dtype),
            jax.ShapeDtypeStruct((T, W, B), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((W, pn, BL), dtype),
            pltpu.VMEM((W, BL), dtype),
        ],
        interpret=interpret,
    )(*ins)

    bwd_kernel = _make_bwd_kernel(T, n, m, p, BL)
    ys = pl.pallas_call(
        bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, W, pn, BL), lambda bt, t: (T - 1 - t, 0, 0, bt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, BL), lambda bt, t: (T - 1 - t, 0, bt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, W, BL), lambda bt, t: (T - 1 - t, 0, bt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, W, B), dtype),
        scratch_shapes=[pltpu.VMEM((W, BL), dtype)],
        interpret=interpret,
    )(G, yhat)

    # [T, W, B] -> [B, T*W]
    return jnp.transpose(ys, (2, 0, 1)).reshape(B, T * W)


def _largest_block(B: int, cap: int = 128) -> int:
    for bl in range(min(cap, B), 0, -1):
        if B % bl == 0:
            return bl
    return 1


@functools.lru_cache(maxsize=None)
def thomas_pallas_for_spec(spec, interpret: bool = False):
    """Per-sample Thomas solve that dispatches to the lane-batched Pallas
    kernel under ``vmap`` (``jax.custom_batching.custom_vmap``): the solver
    stays written per-scenario, while batched solves hit the fused kernel
    with the batch as the TPU lane dimension."""

    @jax.custom_batching.custom_vmap
    def solve(jb, b):
        jb1 = jax.tree_util.tree_map(lambda x: x[None], jb)
        return solve_thomas_pallas(spec, jb1, b[None], block_lanes=1,
                                   interpret=interpret)[0]

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
                                  interpret=interpret)
        return out, True

    return solve
