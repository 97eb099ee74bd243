"""Fused deformable-attention sampling for TPU.

The deformable attention in the BEV transformer needs, per query, 8 bilinear
samples per head from a (200,200) value map (reference
transformer_modules.py:107-167). A naive XLA gather of the 4 bilinear
neighbours (128 B rows) runs at ~3 GB/s on TPU (~1.5 s/layer at B=4) because
TPU gather efficiency collapses for skinny rows.

TPU redesign — the **patch-map gather**:
  * zero-pad the value map by 1 px and precompute, per position, the
    concatenation of its 2x2 neighbourhood: rows of 4*dh floats (512 B).
    This is a handful of dense shifted copies — fused, HBM-speed.
  * every bilinear sample then needs exactly ONE row fetch whose 512 B are
    all useful (the 4 neighbours), which lands in the efficient gather
    regime measured at ~23 GB/s — ~6x faster end-to-end.
  * the (bilinear x attention)-weighted reduction over the 8 sampling points
    is folded into a lax.scan over points so the gathered rows never
    materialize beyond one point's worth.

Zero-padding supplies torch grid_sample's padding_mode='zeros' semantics for
free: out-of-image neighbours fetch zeros. Sampling locations must be
pre-clamped to [0, 1] (the reference clamps too, transformer_modules.py:131),
which bounds anchors inside the padded table.

Measured (v5e, B=4, 8 heads, dh=32, 200x200, 8 pts): naive 1521 ms -> patch
~150 ms (honest scan-amortized timing; earlier per-call timings carried a
~26 ms host-tunnel floor). Round-2 findings that supersede the round-1
"fetch-count bound" theory:
  * the XLA patch gather is bound by DRAM row-buffer locality: random 512-B
    fetches from the ~660 MB HBM table run at ~70 M rows/s, but the *same*
    gather against a 20 MB table runs at ~320 M rows/s — the fetch COUNT was
    never the wall, the table's HBM footprint was;
  * v5e has 128 MB of VMEM (not 16), so the per-bh patch table (20.7 MB)
    fits on-chip: the Pallas kernel in `deformable_pallas.py` pins it in
    VMEM and gathers at ~470 M rows/s (~2 cycles/row) — see that module;
  * Mosaic's `tpu.dynamic_gather` is intra-vreg only ("multiple source vregs
    along gather dimension" is unimplemented), so the kernel uses per-row
    dynamic vector loads driven by SMEM scalar indices instead.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _build_patch_table(v: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """v: (BH, dh, H*W) -> patch table (BH*(H+1)*(W+1), 4*dh).

    Row at padded anchor (y, x) holds [V[y-1,x-1], V[y-1,x], V[y,x-1], V[y,x]]
    of the unpadded map — i.e. anchoring a bilinear sample at its floor
    corner fetches all four neighbours at once.
    """
    bh, dh, hw = v.shape
    vimg = jnp.moveaxis(v, 1, 2).reshape(bh, h, w, dh)
    vp = jnp.pad(vimg, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patch = jnp.concatenate(
        [vp[:, :-1, :-1], vp[:, :-1, 1:], vp[:, 1:, :-1], vp[:, 1:, 1:]],
        axis=-1,
    )  # (BH, H+1, W+1, 4*dh)
    return patch.reshape(bh * (h + 1) * (w + 1), 4 * dh)


def deformable_sample_combine_patch(
    v: jnp.ndarray,  # (BH, dh, HW) value maps, channel-major
    locs: jnp.ndarray,  # (BH, npts, N, 2) in [0,1], (x, y) order
    attn: jnp.ndarray,  # (BH, npts, N)
    h: int,
    w: int,
) -> jnp.ndarray:
    return deformable_sample_combine_patch_xy(
        v, locs[..., 0], locs[..., 1], attn, h, w
    )


def deformable_sample_combine_patch_xy(
    v: jnp.ndarray,  # (BH, dh, HW) value maps, channel-major
    lx: jnp.ndarray,  # (BH, npts, N) x locations in [0,1]
    ly: jnp.ndarray,  # (BH, npts, N) y locations in [0,1]
    attn: jnp.ndarray,  # (BH, npts, N)
    h: int,
    w: int,
    prefold: bool = False,  # True -> (BH, N, 4*dh) quadrant-separated output
) -> jnp.ndarray:
    """Returns (BH, N, dh): attention-weighted bilinear samples. (N-major
    output avoids a 164MB transpose per scan step.)

    x/y locations are SEPARATE dense arrays: a trailing size-2 coordinate
    axis would be lane-padded 2->128 by the TPU layout whenever such a
    tensor materializes (64x HBM blow-up) — measured at ~90 ms per flagship
    forward before this was restructured."""
    bh, dh, hw = v.shape
    npts, n = lx.shape[1], lx.shape[2]
    tab = _build_patch_table(v, h, w)
    pw = w + 1

    # align_corners=False pixel coords
    fx = lx * w - 0.5
    fy = ly * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    ax = x0.astype(jnp.int32) + 1  # anchors into the padded table
    ay = y0.astype(jnp.int32) + 1
    base = (jnp.arange(bh, dtype=jnp.int32) * ((h + 1) * pw))[:, None, None]
    gidx = base + ay * pw + ax  # (BH, npts, N)

    # combined (bilinear x attention) weights per patch quadrant
    w00 = (1 - wy) * (1 - wx) * attn
    w01 = (1 - wy) * wx * attn
    w10 = wy * (1 - wx) * attn
    w11 = wy * wx * attn

    # Unrolled over the npts points (9% faster than lax.scan: no loop state
    # machine, XLA fuses each gather+weight+add chain). jax.checkpoint on the
    # per-point body: without it AD saves every point's gathered rows
    # ((BH, N, 4dh) x npts ~ 10 GB at B=8) as residuals; recomputing the
    # gather in backward costs one extra gather pass and saves all of it.
    @jax.checkpoint
    def point_sample(gi, a00, a01, a10, a11):
        rows = tab.at[gi.reshape(-1)].get(mode="promise_in_bounds")
        rows = rows.reshape(bh, n, 4 * dh)
        return (
            rows[..., 0 * dh : 1 * dh] * a00[..., None]
            + rows[..., 1 * dh : 2 * dh] * a01[..., None]
        ) + (
            rows[..., 2 * dh : 3 * dh] * a10[..., None]
            + rows[..., 3 * dh : 4 * dh] * a11[..., None]
        )  # (BH, N, dh)

    # accumulate in f32 even when the value maps are bf16
    acc = jnp.zeros((bh, n, dh), dtype=jnp.float32)
    for p in range(npts):
        acc = acc + point_sample(
            gidx[:, p], w00[:, p], w01[:, p], w10[:, p], w11[:, p]
        ).astype(acc.dtype)
    out = acc.astype(v.dtype)
    if prefold:
        # fold-in-group-0 representation: any fold-respecting consumer (sum
        # over quadrant groups / FoldingDense) sees identical values, and the
        # VJP under a quadrant-replicated cotangent is exactly vjp(g[:dh]).
        # A true quadrant-separated XLA prefold was measured to materialize
        # ~30 GB of lane-padded per-point parts — not worth it.
        zero = jnp.zeros_like(out)
        out = jnp.concatenate([out, zero, zero, zero], axis=-1)
    return out


def deformable_sample_combine_xla(
    v: jnp.ndarray, locs: jnp.ndarray, attn: jnp.ndarray, h: int, w: int,
    query_chunk: int = 4000,
) -> jnp.ndarray:
    """Reference XLA path (4-neighbour gather via ops.sampling): used as the
    CPU/test oracle and for shapes the patch path doesn't cover."""
    from .sampling import grid_sample_bilinear

    bh, dh, hw = v.shape
    npts, n = locs.shape[1], locs.shape[2]
    vmap_img = jnp.moveaxis(v, 1, 2).reshape(bh, h, w, dh)

    def combine(l, a):
        # l: (bh, npts, m, 2), a: (bh, npts, m)
        m = l.shape[2]
        grid = l * 2.0 - 1.0
        s = grid_sample_bilinear(
            vmap_img, jnp.moveaxis(grid, 1, 2).reshape(bh, m * npts, 2)
        ).reshape(bh, m, npts, dh)
        return jnp.einsum("bpm,bmpd->bmd", a, s)

    if n > query_chunk and n % query_chunk == 0:
        k = n // query_chunk
        ls = jnp.moveaxis(locs.reshape(bh, npts, k, query_chunk, 2), 2, 0)
        as_ = jnp.moveaxis(attn.reshape(bh, npts, k, query_chunk), 2, 0)
        out = jax.lax.map(lambda t: combine(*t), (ls, as_))  # (k, bh, m, dh)
        return jnp.moveaxis(out, 0, 1).reshape(bh, n, dh)
    return combine(locs, attn)


# Process-wide override for impl="auto" call sites (None = pick by backend).
# Lets benchmarks/tests flip the sampling engine without re-plumbing configs.
_DEFAULT_IMPL: str | None = None


def set_default_impl(impl: str | None) -> None:
    global _DEFAULT_IMPL
    assert impl in (None, "auto", "pallas", "patch", "xla", "zeros")
    _DEFAULT_IMPL = None if impl == "auto" else impl


def _resolve_impl(impl: str, dh: int) -> str:
    from . import deformable_pallas

    if impl == "auto" and _DEFAULT_IMPL is not None:
        impl = _DEFAULT_IMPL
    if impl == "auto":
        if jax.default_backend() == "cpu":
            impl = "xla"
        elif deformable_pallas.supports(dh):
            impl = "pallas"
        else:
            impl = "patch"
    if impl == "pallas" and not deformable_pallas.supports(dh):
        impl = "patch"
    return impl


def deformable_sample_combine(
    v: jnp.ndarray, locs: jnp.ndarray, attn: jnp.ndarray, h: int, w: int,
    impl: str = "auto",
) -> jnp.ndarray:
    return deformable_sample_combine_xy(
        v, locs[..., 0], locs[..., 1], attn, h, w, impl
    )


def deformable_sample_combine_xy(
    v: jnp.ndarray, lx: jnp.ndarray, ly: jnp.ndarray, attn: jnp.ndarray,
    h: int, w: int, impl: str = "auto", prefold: bool = False,
    keep_pad: bool = False,
) -> jnp.ndarray:
    """With prefold=True returns (BH, N, 4*dh): the 4 bilinear-quadrant
    contributions in separate lane groups (sum over groups = the folded
    output). Lets the consumer absorb the fold into its next matmul so no
    narrow (dh=32-lane) tensor ever materializes (TPU lane-padding)."""
    from . import deformable_pallas

    impl = _resolve_impl(impl, v.shape[1])
    dh = v.shape[1]
    if impl == "zeros":  # profiling/ablation knob: everything-but-sampling
        cw = 4 * dh if prefold else dh
        return jnp.zeros((v.shape[0], lx.shape[2], cw), v.dtype)
    if impl == "pallas":
        if prefold:
            return deformable_pallas.deformable_sample_combine_pallas_xy_prefold(
                v, lx, ly, attn, h, w, keep_pad
            )
        return deformable_pallas.deformable_sample_combine_pallas_xy(
            v, lx, ly, attn, h, w
        )
    if impl == "patch":
        return deformable_sample_combine_patch_xy(
            v, lx, ly, attn, h, w, prefold=prefold
        )
    out = deformable_sample_combine_xla(
        v, jnp.stack([lx, ly], axis=-1), attn, h, w
    )
    if prefold:
        # quadrant-separated equivalent: put the folded sum in group 0 —
        # any fold-absorbing consumer treats the groups identically
        zero = jnp.zeros_like(out)
        out = jnp.concatenate([out, zero, zero, zero], axis=-1)
    return out
