"""Pallas TPU kernel for deformable-attention sampling.

Matches the semantics of `deformable_sample_combine_patch` (the XLA patch-map
gather, itself oracle-tested against torch ``F.grid_sample`` — reference
transformer_modules.py:107-167) but keeps the per-(batch*head) patch table
**resident in VMEM** (20.7 MB at 200x200, dh=32 — v5e has 128 MB of VMEM) and
gathers rows with per-row dynamic vector loads.

Why this wins (measured on v5e, honest scan-amortized timing):
  * the XLA path gathers 512-B rows at random offsets from a ~660 MB HBM
    table; DRAM row-buffer locality collapses and throughput lands at
    ~70 M rows/s (150 ms at B=4).
  * the same gather against a VMEM-resident table runs at ~470 M rows/s
    (~2 cycles/row) — VMEM has uniform access cost, so randomness is free.
  * the (bilinear x attention) quadrant weights are kept compact
    ((..., 4) per sample) and expanded to 128-lane rows **on the MXU inside
    the kernel** (w4 @ E with a 0/1 selector matrix), so HBM never sees the
    expanded weights.

Layout: one grid step = (one batch*head, one chunk of QC queries). The patch
table block revisits the same index for all query chunks of a bh, so Pallas
DMAs it once per bh (~660 MB/s total — 0.8 ms at B=4). Indices live in SMEM
(scalar reads drive the dynamic row loads); weights and outputs stream
through VMEM double-buffered.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows gathered per inner-loop step (8 sublanes = one f32 vreg of queries).
_QGROUP = 8
# Queries per grid step. 8 MB of expanded weights + 1 MB output per buffer.
_QC = 2048
# Flipped by tests to run the kernel in the Pallas interpreter on CPU.
_INTERPRET = False


def _kernel(idx_ref, tab_ref, w4_ref, out_ref, wvec_ref, *, npts: int, dh: int):
    qc = out_ref.shape[1]
    cw = out_ref.shape[2]
    # Expand compact quadrant weights (4, qc) per point to row weights
    # (qc, 128) on the MXU: E[c, j] = [j // dh == c]. Exact in f32 (E is
    # 0/1), so force HIGHEST to keep bf16-rounding out of w4. The quadrant
    # axis is carried as a LEADING axis end-to-end — a trailing size-4 axis
    # would be lane-padded 4->128 by the TPU layout (32x HBM blow-up).
    e = (
        jax.lax.broadcasted_iota(jnp.int32, (4, cw), 1) // dh
        == jax.lax.broadcasted_iota(jnp.int32, (4, cw), 0)
    ).astype(jnp.float32)
    for p in range(npts):
        wvec_ref[pl.ds(p * qc, qc), :] = jax.lax.dot_general(
            w4_ref[0, :, p, :],  # (4, qc)
            e,  # (4, cw)
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def body(q8, _):
        q0 = q8 * _QGROUP
        acc = jnp.zeros((_QGROUP, cw), jnp.float32)
        for p in range(npts):
            rows = jnp.concatenate(
                [
                    tab_ref[0, pl.ds(idx_ref[0, p, q0 + s], 1), :]
                    for s in range(_QGROUP)
                ],
                axis=0,
            )
            acc = acc + rows * wvec_ref[pl.ds(p * qc + q0, _QGROUP), :]
        out_ref[0, pl.ds(q0, _QGROUP), :] = acc
        return 0

    jax.lax.fori_loop(0, qc // _QGROUP, body, 0, unroll=False)


def _sample_pallas(tab, gidx, w4, npts: int, dh: int):
    """tab (BH, R_pad, 4*dh) f32; gidx (BH, npts, N_pad) int32;
    w4 (BH, 4, npts, N_pad) f32 -> (BH, N_pad, 4*dh) f32 (pre-fold).

    Callers are expected to be inside jit (model apply); `_INTERPRET` is read
    at trace time so tests can run the kernel on CPU."""
    bh, r_pad, cw = tab.shape
    n_pad = gidx.shape[2]
    qc = min(_QC, n_pad)
    grid = (bh, n_pad // qc)
    kern = functools.partial(_kernel, npts=npts, dh=dh)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, npts, qc), lambda b, i: (b, 0, i), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, r_pad, cw), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 4, npts, qc), lambda b, i: (b, 0, 0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, qc, cw), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, cw), jnp.float32),
        scratch_shapes=[pltpu.VMEM((npts * qc, cw), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(gidx, tab, w4)


def supports(dh: int) -> bool:
    """The kernel wants one-vreg rows: 4*dh == 128 (flagship dh=32)."""
    return 4 * dh == 128


def _prep(v, locs, attn, h: int, w: int):
    """Shared geometry: padded-anchor indices + combined quadrant weights.

    Same math as the XLA patch path (align_corners=False, zero padding
    outside, locations pre-clamped to [0,1] by the caller — reference
    transformer_modules.py:131,152)."""
    from .deformable_sampling import _build_patch_table

    bh, dh, hw = v.shape
    npts, n = locs.shape[1], locs.shape[2]
    pw = w + 1
    r = (h + 1) * pw

    fx = locs[..., 0] * w - 0.5
    fy = locs[..., 1] * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    ax = x0.astype(jnp.int32) + 1
    ay = y0.astype(jnp.int32) + 1
    gidx = jnp.clip(ay * pw + ax, 0, r - 1)  # (BH, npts, N), per-bh rows

    w4 = jnp.stack(
        [
            (1 - wy) * (1 - wx) * attn,
            (1 - wy) * wx * attn,
            wy * (1 - wx) * attn,
            wy * wx * attn,
        ],
        axis=1,
    )  # (BH, 4, npts, N) — quadrant axis leading (lane-padding trap, see kernel)

    tab = _build_patch_table(v.astype(jnp.float32), h, w).reshape(bh, r, 4 * dh)
    return tab, gidx, w4.astype(jnp.float32)


def _forward(v, locs, attn, h: int, w: int):
    bh, dh, hw = v.shape
    npts, n = locs.shape[1], locs.shape[2]
    tab, gidx, w4 = _prep(v, locs, attn, h, w)

    r = tab.shape[1]
    r_pad = -(-r // 8) * 8
    qc = min(_QC, -(-n // _QGROUP) * _QGROUP)
    n_pad = -(-n // qc) * qc
    if r_pad != r:
        tab = jnp.pad(tab, ((0, 0), (0, r_pad - r), (0, 0)))
    if n_pad != n:
        gidx = jnp.pad(gidx, ((0, 0), (0, 0), (0, n_pad - n)))
        w4 = jnp.pad(w4, ((0, 0), (0, 0), (0, 0), (0, n_pad - n)))

    out128 = _sample_pallas(tab, gidx, w4, npts, dh)  # (BH, N_pad, 4*dh)
    out = out128[:, :n].reshape(bh, n, 4, dh).sum(axis=2)
    return out.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def deformable_sample_combine_pallas(v, locs, attn, h: int, w: int):
    """(BH, N, dh) attention-weighted bilinear samples — Pallas forward.

    Backward runs the XLA patch path's VJP (gradient-exact; a dedicated
    backward kernel is future work — forward dominates inference)."""
    return _forward(v, locs, attn, h, w)


def _fwd(v, locs, attn, h, w):
    return _forward(v, locs, attn, h, w), (v, locs, attn)


def _bwd(h, w, res, g):
    from .deformable_sampling import deformable_sample_combine_patch

    v, locs, attn = res
    _, vjp = jax.vjp(
        lambda vv, ll, aa: deformable_sample_combine_patch(vv, ll, aa, h, w),
        v,
        locs,
        attn,
    )
    return vjp(g)


deformable_sample_combine_pallas.defvjp(_fwd, _bwd)
