"""Fused lift+splat Pallas kernel (reference tools.py:181-218 +
model_baseline.py:84-126, redesigned per SURVEY §7.2b).

The XLA path materializes the lifted frustum tensor (B, P, C) — 66 MB bf16
at flagship shapes — and scatter-adds it with `segment_sum` (measured
3.4 ms/batch @ B=6: XLA lowers the scatter as a windowed read-modify-write
over the 240k-row output in HBM). Here the (X*Y, C) BEV accumulator for one
batch element lives in a VMEM scratch (20.5 MB f32 at 200x200x128 — v5e has
128 MB); points stream through in chunks, and each point performs

    bev[seg[p]] += depth[p] * feat[fidx[p]]

entirely on-chip: one dynamic row load from the (small, VMEM-resident)
per-camera feature block, a scalar-broadcast multiply, and a sequential
read-modify-write into the accumulator (sequential per point, so same-voxel
collisions accumulate correctly — the same pattern as the sampling backward
kernel's gradient table). The lift outer product is fused: the frustum
tensor never exists anywhere.

Out-of-bounds points arrive with depth == 0 and seg == 0 (the caller folds
the validity mask into the depth weight), so no dump row is needed.

The op is linear in the lifted features, so its VJP does not depend on the
forward implementation; the custom_vjp backward reuses the XLA path's
gather (segment_sum VJP == QuickCumsum backward, see ops.lift_splat).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Points per grid step.
_PC = 2048
# Accumulator stripes: consecutive points alternate between independent
# VMEM accumulators, so Mosaic doesn't serialize the scatter on a
# may-alias load-after-store chain (the same trick as the sampling
# backward's striped gradient table). Stripes are summed in an epilogue
# on the last point chunk. Must divide _PC.
# Measured on v5e @B=6 flagship (geometry+lift_splat stage): 1 stripe
# 3.17 ms, 2 stripes 2.70 ms. (3 would leave pad work: 2048 % 3 != 0.)
_STRIPES = 4
# Flipped by tests to run in the Pallas interpreter on CPU.
_INTERPRET = False


def _kernel(seg_ref, fidx_ref, depth_ref, feat_ref, out_ref, *stripe_refs,
            pc: int):
    """Accumulates into the f32 output block plus (_STRIPES - 1) scratch
    stripes, all revisited across point chunks (zeroed at chunk 0); the
    stripes fold into the output on the LAST chunk. Point p goes to stripe
    p %% _STRIPES via a static x-stripes unroll of the loop body — a
    data-dependent branch here would break Mosaic's pipelining."""
    ns = len(stripe_refs) + 1

    @pl.when(pl.program_id(1) == 0)
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)
        for sr in stripe_refs:
            sr[...] = jnp.zeros_like(sr)

    def body(q, _):
        p0 = q * ns
        for k in range(ns):
            p = p0 + k
            d = depth_ref[0, 0, p]
            r = fidx_ref[0, 0, p]
            s = seg_ref[0, 0, p]
            row = feat_ref[0, pl.ds(r, 1), :].astype(jnp.float32)
            if k == 0:
                out_ref[0, pl.ds(s, 1), :] = (
                    out_ref[0, pl.ds(s, 1), :] + d * row
                )
            else:
                sr = stripe_refs[k - 1]
                sr[pl.ds(s, 1), :] = sr[pl.ds(s, 1), :] + d * row
        return 0

    jax.lax.fori_loop(0, pc // ns, body, 0, unroll=False)

    if stripe_refs:

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _fold():
            acc = out_ref[0]
            for sr in stripe_refs:
                acc = acc + sr[...]
            out_ref[0] = acc


def fused_lift_splat(feat, depth, seg, fidx, n_voxels: int, out_dtype=None):
    """feat (B, R, C) camera features; depth (B, P) f32 lift weights (0 for
    invalid points); seg (B, P) int32 voxel rows in [0, n_voxels); fidx
    (B, P) int32 rows into feat -> (B, n_voxels, C) scatter-added BEV.

    VMEM at flagship shapes (n_voxels=40000, C=128): acc 20.5 + out window
    2x10 (bf16) + feat/operand windows ~1 = ~42 MB."""
    b, r, c = feat.shape
    p = depth.shape[1]
    if out_dtype is None:
        out_dtype = feat.dtype
    pc = min(_PC, -(-p // _STRIPES) * _STRIPES)
    p_pad = -(-p // pc) * pc
    assert pc % _STRIPES == 0
    if p_pad != p:
        pad = ((0, 0), (0, p_pad - p))
        depth = jnp.pad(depth, pad)  # zero depth => no contribution
        seg = jnp.pad(seg, pad)
        fidx = jnp.pad(fidx, pad)
    assert n_voxels % 8 == 0

    # (B, 1, P) so the SMEM block's trailing two dims are (1 == array dim, pc)
    seg3 = seg[:, None, :]
    fidx3 = fidx[:, None, :]
    depth3 = depth.astype(jnp.float32)[:, None, :]
    sspec = pl.BlockSpec(
        (1, 1, pc), lambda b_, i: (b_, 0, i), memory_space=pltpu.SMEM
    )
    return pl.pallas_call(
        functools.partial(_kernel, pc=pc),
        grid=(b, p_pad // pc),
        in_specs=[
            sspec,
            sspec,
            sspec,
            pl.BlockSpec((1, r, c), lambda b_, i: (b_, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n_voxels, c), lambda b_, i: (b_, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_voxels, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n_voxels, c), jnp.float32)
            for _ in range(_STRIPES - 1)
        ],
        compiler_params=pltpu.CompilerParams(
            # out window 2x20.5 + (stripes-1) x 20.5 scratch + feat ~1.5 MB
            vmem_limit_bytes=115 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=_INTERPRET,
        # feat crosses as f32: dynamic single-sublane loads need 32-bit rows
        # (bf16 packs two sublanes per word — unprovable alignment for Mosaic)
    )(seg3, fidx3, depth3, feat.astype(jnp.float32)).astype(out_dtype)


def enabled_for_backend() -> bool:
    return _INTERPRET or jax.default_backend() != "cpu"
