"""Pallas TPU kernel: fused line-search trial evaluation.

The line search's trial-residual pass (``solver.line_search`` →
``residual.point_lite_res``; the reference's per-trial ``residual!``,
``src/problem/solver_methods.jl:111-123``) is the largest remaining XLA-glue
block of the flagship profile (round-4 roofline: "loop fusion" 0.297 ms +
shares of "custom fusion"/"data formatting" per 128-lane chunk, vs a
~4 µs VPU flop floor — the XLA lowering is layout/HBM-bound, not
flop-bound).  This kernel runs the ENTIRE trial — trial-point formation
``z + alpha*dz``, RK2 dynamics residual, VJP dual pulls, cost gradients,
constraint values, AL gradients, the Tikhonov pull, and the L1 residual
norm — as ONE ``pallas_call`` whose only HBM traffic is the lane-last
inputs and the carried ``PointLite`` outputs.

Genericity: the kernel body does NOT hand-transcribe the math.  It loads
the lane-last blocks and replays the exact public evaluation path
(:func:`~..problem.residual.point_lite_res`) per lane via
``jax.vmap(..., in_axes=-1)`` — any model family or constraint stack that
Mosaic can lower runs unmodified, and op-order parity with the XLA path is
a single code path, not a re-implementation.  The whole horizon fits VMEM
(~10 KB/lane for the flagship), so the grid is batch-tiles only.

Enabled per-solve via ``Options.ls_fused`` (off by default) on the
``pallas`` method path; `tests/test_trial_pallas.py` pins interpret-mode
equivalence against the XLA trial pass.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.traj import PrimalDual


def _l1_2d(a):
    """Sum of |a| folded to a [1, 1] tensor — every intermediate stays
    >= 2D (Mosaic fatals on sub-2D layouts inside kernels)."""
    s = jnp.abs(a)
    while s.ndim > 2:
        s = jnp.sum(s, axis=0)
    return jnp.sum(s, axis=(0, 1), keepdims=True)


def _trial_eval(model, spec, obj, gc, traj, dtraj, alpha, reg_eff,
                kernel_safe=False):
    """One trial evaluation per lane — the body the kernel replays.

    Identical math to ``solver.line_search``'s ``trial_point`` (trial
    formation + :func:`~..problem.residual.point_lite_res` + Tikhonov pull
    + L1 norm); the Tikhonov delta uses ``alpha * dtraj`` directly (equal
    to ``trial - traj`` up to one rounding).  ``kernel_safe`` keeps the
    norm's reduction intermediates >= 2D (same sum, axis-by-axis order)."""
    from ..core.traj import update_traj
    from ..problem import residual as R
    if kernel_safe:
        # Rank-0 intermediates trip a Mosaic layout CHECK inside kernels
        # (probed round 5: a [1]->scalar reshape aborts the compiler);
        # promote the per-lane scalars to (1, 1) — broadcasting is
        # unchanged against every operand they meet.
        alpha = jnp.reshape(alpha, (1, 1))
        reg_eff = jnp.reshape(reg_eff, (1, 1))
    trial = update_traj(traj, alpha, dtraj)
    lite, res_t = R.point_lite_res(model, spec, obj, gc, trial)
    rx = res_t.rx + (reg_eff * alpha) * dtraj.x[1:][:, None, :]
    ru = res_t.ru + (reg_eff * alpha) * dtraj.u
    if kernel_safe:
        tn = (_l1_2d(rx) + _l1_2d(ru) + _l1_2d(res_t.rd)) / spec.S
        return tn, lite                      # tn [1, 1]
    tn = R.residual_norm(spec, R.Residual(rx=rx, ru=ru, rd=res_t.rd))
    return tn, lite


@functools.lru_cache(maxsize=None)
def fused_trial_for_spec(model, spec, interpret: bool = False,
                         block_lanes: int = 128):
    """``custom_vmap`` dispatcher for the fused trial kernel: per-lane
    callable ``trial(traj, dtraj, alpha, reg_eff, gc, obj) -> (tn, lite)``
    that lowers a vmapped batch to ONE lane-last Pallas kernel.  Leaves that
    the surrounding ``vmap`` did not batch (typically ``obj`` and the
    constraint params) ride along as shared VMEM constants."""

    @jax.custom_batching.custom_vmap
    def trial(traj, dtraj, alpha, reg_eff, gc, obj):
        out = _run(1, [False] * _n_leaves((traj, dtraj, alpha, reg_eff, gc,
                                           obj)),
                   traj, dtraj, alpha, reg_eff, gc, obj, single=True)
        return out

    def _n_leaves(tree):
        return len(jax.tree_util.tree_leaves(tree))

    def _run(axis_size, flags, traj, dtraj, alpha, reg_eff, gc, obj,
             single=False):
        args = (traj, dtraj, alpha, reg_eff, gc, obj)
        leaves, treedef = jax.tree_util.tree_flatten(args)
        if single:
            # Promote every leaf to a 1-lane batch so one code path serves
            # both the un-vmapped call and the batched rule.
            leaves = [x[None] for x in leaves]
            flags = [True] * len(leaves)
            axis_size = 1
        lane, const, kinds, shapes, dtypes = [], [], [], [], []
        for x, f in zip(leaves, flags):
            if x.size == 0:
                # Zero-size leaves (e.g. an empty CollisionCost pair list)
                # cannot be Pallas inputs; recreate them in-kernel.
                shp = x.shape[1:] if f else x.shape
                shapes.append(shp)
                dtypes.append(x.dtype)
                kinds.append("zero")
            elif f:
                v = jnp.moveaxis(x, 0, -1)
                shapes.append(v.shape[:-1])
                dtypes.append(x.dtype)
                if v.ndim == 1:
                    v = v[None]            # lane-last wants >= 2D blocks
                lane.append(v)
                kinds.append("lane")
            else:
                shapes.append(x.shape)
                dtypes.append(x.dtype)
                const.append(x if x.ndim >= 1 else x[None])
                kinds.append("const")

        def eval_fn(lane_vals, const_vals):
            it_l, it_c, merged = iter(lane_vals), iter(const_vals), []
            for kind, shp, dt0 in zip(kinds, shapes, dtypes):
                if kind == "zero":
                    merged.append(jnp.zeros(shp, dt0))
                    continue
                v = next(it_l) if kind == "lane" else next(it_c)
                merged.append(v.reshape(shp))
            t, dt_, a, rg, gc_l, obj_l = jax.tree_util.tree_unflatten(
                treedef, merged)
            tn, lite = _trial_eval(model, spec, obj_l, gc_l, t, dt_, a, rg,
                                   kernel_safe=True)
            # tn is [1, 1]; emit [1] so the output block is 2D lane-last.
            return tn[0], lite

        bl = block_lanes
        while axis_size % bl:
            bl //= 2
        outs = trial_eval_pallas(lane, const, eval_fn, axis_size,
                                 block_lanes=bl, interpret=interpret)
        outs = jax.tree_util.tree_map(lambda a: jnp.moveaxis(a, -1, 0), outs)
        tn, lite = outs
        tn = tn[:, 0]
        if single:
            return tn[0], jax.tree_util.tree_map(lambda a: a[0], lite)
        return tn, lite

    @trial.def_vmap
    def _rule(axis_size, in_batched, traj, dtraj, alpha, reg_eff, gc, obj):
        flags = jax.tree_util.tree_leaves(in_batched)
        out = _run(axis_size, flags, traj, dtraj, alpha, reg_eff, gc, obj)
        out_batched = jax.tree_util.tree_map(lambda _: True, out)
        return out, out_batched

    return trial


def trial_eval_pallas(lane_tree, const_tree, eval_fn, B,
                      block_lanes: int = 128, interpret: bool = False):
    """Run ``eval_fn`` (a per-lane trial evaluation built on
    ``point_lite_res``) inside one Pallas kernel over lane tiles.

    ``lane_tree``: list of leaves with a TRAILING lane axis [..., B] (all
    >= 2D).  ``const_tree``: list of unbatched leaves shared across lanes.
    ``eval_fn(lane_vals, const_vals)`` sees one lane's values (lane axis
    stripped) and must return leaves that are all >= 1D.  Returns the
    stacked per-lane outputs with a trailing lane axis.
    """
    BL = min(block_lanes, B)
    assert B % BL == 0

    # Probe output structure at trace time.
    out_probe = jax.eval_shape(
        lambda ls, cs: eval_fn(ls, cs),
        [jax.eval_shape(lambda x=x: x[..., 0], x) for x in lane_tree],
        list(const_tree))
    out_leaves, out_treedef = jax.tree_util.tree_flatten(out_probe)
    n_lane = len(lane_tree)

    # The evaluation path embeds static numpy constants (constraint index
    # maps, bound masks, dt scalings); Pallas kernels may not capture
    # constant arrays, so trace the block computation to a jaxpr and feed
    # its consts as explicit kernel inputs (bool consts ride as int8 —
    # Mosaic has no i1 memrefs — and are cast back in-kernel).
    def block_fn(*vals):
        lane_vals = list(vals[:n_lane])
        const_vals = list(vals[n_lane:])
        outs = jax.vmap(
            lambda *ls: eval_fn(list(ls), const_vals),
            in_axes=-1, out_axes=-1)(*lane_vals)
        return tuple(jax.tree_util.tree_leaves(outs))

    example = ([jax.ShapeDtypeStruct(x.shape[:-1] + (BL,), x.dtype)
                for x in lane_tree]
               + [jax.ShapeDtypeStruct(x.shape, x.dtype)
                  for x in const_tree])
    closed = jax.make_jaxpr(block_fn)(*example)
    hoisted = [np.asarray(c) for c in closed.consts]

    def pack(c):
        v = c.astype(np.int8) if c.dtype == np.bool_ else c
        return jnp.asarray(v.reshape(v.shape if v.ndim else (1,)))

    const_inputs = list(const_tree) + [pack(c) for c in hoisted]
    n_in = n_lane + len(const_inputs)

    def kernel(*refs):
        vals = [r[...] for r in refs[:n_in]]
        out_refs = refs[n_in:]
        in_vals = vals[:n_lane + len(const_tree)]
        cvals = []
        for v, orig in zip(vals[n_lane + len(const_tree):], hoisted):
            v = v.reshape(orig.shape)
            if orig.dtype == np.bool_:
                v = v.astype(jnp.bool_)
            cvals.append(v)
        flat = jax.core.eval_jaxpr(closed.jaxpr, cvals, *in_vals)
        for r, v in zip(out_refs, flat):
            r[...] = v

    def lane_spec(x):
        nd = x.ndim
        return pl.BlockSpec(x.shape[:-1] + (BL,),
                            lambda b, nd=nd: (0,) * (nd - 1) + (b,),
                            memory_space=pltpu.VMEM)

    def const_spec(x):
        nd = x.ndim
        return pl.BlockSpec(x.shape, lambda b, nd=nd: (0,) * nd,
                            memory_space=pltpu.VMEM)

    out_specs = []
    out_shapes = []
    for s in out_leaves:
        nd = len(s.shape)
        out_specs.append(pl.BlockSpec(
            s.shape + (BL,), lambda b, nd=nd: (0,) * nd + (b,),
            memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(s.shape + (B,), s.dtype))

    res = pl.pallas_call(
        kernel,
        grid=(B // BL,),
        in_specs=[lane_spec(x) for x in lane_tree]
                 + [const_spec(x) for x in const_inputs],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(*lane_tree, *const_inputs)
    res = res if isinstance(res, (list, tuple)) else [res]
    return jax.tree_util.tree_unflatten(out_treedef, list(res))
