"""Pallas TPU kernels for deformable-attention sampling (fwd + bwd).

Matches the semantics of `deformable_sample_combine_patch` (the XLA patch-map
gather, itself oracle-tested against torch ``F.grid_sample`` — reference
transformer_modules.py:107-167) but keeps the per-(batch*head) patch table
**resident in VMEM** (21 MB at 200x200, dh=32 — v5e has 128 MB of VMEM) and
gathers rows with per-row dynamic vector loads.

Why this wins (measured on v5e, honest scan-amortized timing):
  * the XLA path gathers 512-B rows at random offsets from a ~660 MB HBM
    table; DRAM row-buffer locality collapses and throughput lands at
    ~70 M rows/s (150 ms at B=4).
  * the same gather against a VMEM-resident table runs at ~470 M rows/s
    (~2 cycles/row) — VMEM has uniform access cost, so randomness is free.
  * everything narrow stays OFF HBM: the patch table crosses HBM
    **channel-major** (`tab_T`: full-lane rows, bf16 when the model computes
    in bf16 — half the DMA) and is transposed to the row-major gather layout
    per bh **on the MXU inside the kernel** (identity-matrix dots over
    2048-column chunks, exact via a hi/lo split for f32); the (bilinear x
    attention) quadrant weights are built in-kernel from compact
    (wx, wy, attn) operands and expanded to 128-lane rows on the MXU
    (w4 @ E with a 0/1 selector matrix). HBM never sees a lane-padded
    narrow tensor or an expanded weight row, and the kernel output is
    emitted directly in the model's compute dtype.

Layout: one grid step = (one batch*head, one chunk of QC queries). The
channel-major table block revisits the same index for all query chunks of a
bh, so Pallas DMAs it once per bh; indices live in SMEM (scalar reads drive
the dynamic row loads); weights and outputs stream through VMEM
double-buffered. The backward kernel accumulates the value-table cotangent
into a VMEM-resident row-major gradient table (read-modify-write per sampled
row; the output block revisits across query chunks) and emits per-(point,
quadrant) dot products from which the location/attention gradients are dense
elementwise math outside the kernel.

Note: a manual-DMA variant (ANY-space operands + double-buffered chunk
streaming) hung the Mosaic compiler on this stack; block-mapped windows with
in-kernel chunked transposes compile fine and the extra double-buffer VMEM
still fits (see the per-call budgets in `_sample_pallas{,_bwd}`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows gathered per inner-loop step (8 sublanes = one f32 vreg of queries).
_QGROUP = 8
# Queries per grid step, and the table-transpose chunk width.
_QC = 2048
# Flipped by tests to run the kernel in the Pallas interpreter on CPU.
_INTERPRET = False
# Gather-loop A/B results (v5e, B=6 flagship shapes, 15.36 M rows):
#   concat-of-8 (this code)      46.1 ms  (~4.3 cycles/row @1.5 GHz)
#   16-query groups              57.9 ms  (2-vreg assembly costs more)
#   VMEM-scratch group assembly  hangs the Mosaic compiler (>15 min)
#   manual unroll x2/x4          46.2/46.1 ms (issue-bound, not latency-bound)
# The ~4.3 c/row = dynamic unaligned-sublane load (aligned load + align) +
# merge into the group vreg + amortized multiply-accumulate; this is the
# exact-gather floor for this ISA — there is no vector-gather instruction.
# Forward table sourcing: "kernel" builds the patch table in-kernel from the
# raw (dh, HW) value map (no HBM patch table at all); "hbm" ships the
# channel-major table through HBM and transposes in-kernel (fallback).
_TABLE_BUILD = "kernel"
# Run-length-coalesced gather: when a query group's _QGROUP indices are
# exactly consecutive (i0, i0+1, ..), ONE unaligned (_QGROUP, 128) vector
# load replaces _QGROUP single-row loads (queries are a raster of the BEV
# grid, image rows are group-aligned, smooth offset fields coalesce).
# MEASURED OFF: the idea fails on this ISA/compiler — measured on v5e at
# B=6 flagship shapes (46.1 ms branch-free baseline, DEF_LOCS=smooth is
# ~90% coalescible):
#   value-level lax.cond          88.0 ms dispersed / 88.4 smooth
#     (lowers to select: BOTH paths execute, plus cond overhead)
#   pl.when pair -> VMEM scratch  93.5 ms dispersed / 79.3 smooth
#     (real branches, but the scratch round-trip + per-group branch breaks
#      Mosaic's software pipelining of the gather loop — even the 1-load
#      fast path ends up slower than the pipelined 8-load concat)
# Conclusion: the branch-free concat-of-8 IS the floor; data-adaptive
# branching cannot beat it inside a Mosaic inner loop. Kept behind this
# flag for reproducibility (tests cover both settings' semantics).
_COALESCE = False
# bf16-packed patch-table rows (forward, in-kernel build, bf16 values only).
# Semantics-preserving when the model computes in bf16: the raw value map is
# already bf16, so the f32 table holds bf16-exact values and packing loses
# nothing. Would halve the table's VMEM footprint (21 -> 10.5 MB) and the
# gathered row width (512 -> 256 B).
# PROBED 2026-08-19, IMPOSSIBLE ON v5e — leave False. Mosaic tiles bf16 as
# (16, 128) with two rows packed per sublane word and rejects any dynamic
# sublane start it cannot prove 8-aligned: both the shifted table-assembly
# copy (vector<200x128xbf16>) and, decisively, the 1-row arbitrary-index
# gather load itself fail to compile with "cannot statically prove that
# index in dimension 0 is a multiple of 8" (standalone micro-kernel probe:
# f32 1-row dynamic loads compile and run; bf16 does not compile at all).
# So the gather row is pinned to f32 width on this generation, and the
# 4.3 cyc/row floor is issue cost, not load-width cost. See PERF.md.
_TABLE_BF16 = False
# Select-compose table assembly (forward, in-kernel build, aligned shapes):
# compose each y-block's 4 quadrant lane-groups in registers from two MXU
# transposes (plain + one-pixel-down) and store once — 4 loads + 1 store
# per block instead of the RMW fallback's 8+4, and no full-table pre-zero.
# Off switch kept for A/B (scripts/bench_sampling.py DEF_RMW=1).
_SELECT_COMPOSE = True


def _hilo(t):
    """Split f32 into (hi, lo) f32 parts such that hi is exactly
    bf16-representable and hi + lo == t. A DEFAULT-precision MXU dot rounds
    each operand pass through bf16: hi passes exactly, lo only carries the
    low mantissa bits (error ~2^-17 relative vs ~2^-8 for a single pass), so
    two dots reproduce an f32-exact result at half the cost of HIGHEST."""
    hi = t.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, t - hi


def _transpose_chunks(src, tab_ref):
    """Transpose src (cw, r) -> tab_ref (r, cw) on the MXU via identity
    dots, one 2048-column chunk at a time (whole-array epilogues were
    measured to spill ~48 MB of vregs). All slices are static; r is padded
    to a multiple of the chunk width by `_prep_cm`."""
    cw, r = src.shape
    ck = _ck(r)
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (cw, cw), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (cw, cw), 1)
    ).astype(jnp.float32)
    dn = (((0,), (0,)), ((), ()))
    exact_in_bf16 = src.dtype == jnp.bfloat16
    for k in range(r // ck):
        t = src[:, k * ck : (k + 1) * ck].astype(jnp.float32)
        if exact_in_bf16:  # one pass suffices: values carry <= 8 mantissa bits
            out = jax.lax.dot_general(
                t, eye, dn, preferred_element_type=jnp.float32
            )
        else:
            t_hi, t_lo = _hilo(t)
            out = jax.lax.dot_general(
                t_hi, eye, dn, preferred_element_type=jnp.float32
            ) + jax.lax.dot_general(
                t_lo, eye, dn, preferred_element_type=jnp.float32
            )
        tab_ref[k * ck : (k + 1) * ck, :] = out


def _build_table_from_v(v_ref, timg_ref, tab_ref, *, h: int, w: int,
                        dh: int, pw: int, timg0_ref=None):
    """Build the row-major patch table (r_pad, 4*dh) f32 in VMEM directly
    from one bh's raw value map v_ref (1, dh, hw_pad) — no HBM patch table.

    Two steps, both on-chip:
      1. broadcast-transpose on the MXU: timg[m, :] = v[:, m] replicated
         across the four dh-lane groups (E[c, j] = [j % dh == c]), chunked
         128-aligned along hw;
      2. quadrant assembly: table row (y, x) wants image pixels
         (y+dy-1, x+dx-1) in lane group g = 2*dy+dx.

    Assembly has two variants:
      * timg0_ref=None (fallback, any w/pw): pre-zero the table, then for
        each (y, g) one contiguous-sublane copy of w rows from timg,
        lane-masked into tab (read-modify-write at dst y*pw + (1-dx)):
        12 VMEM block-ops per y-block (8 loads + 4 stores).
      * timg0_ref given (select-compose; requires w % 8 == 0 and pw % 8 == 0
        so every dynamic sublane start is provably aligned): the transpose
        additionally writes a copy shifted one pixel down
        (timg0[m] = pixel m-1, absorbing the dx-1 column shift), then each
        y-block is composed in registers from 4 aligned loads with 3
        lane-group selects and written with ONE store — 4 loads + 1 store
        per block, ~2.4x less VMEM traffic, and the full-table pre-zero
        disappears (pad rows beyond ax=w are unreachable: gidx = ay*pw+ax
        with ax <= w). x/y image edges become register masks / peeled
        first+last blocks instead of skipped writes. A/B on v5e flagship
        shapes (scripts/bench_sampling.py DEF_RMW=1, same session):
        RMW 45.73 -> select-compose 44.72 ms/batch @B=6 bf16 — most of
        the build already hid under the gather's software pipeline; the
        kernel now sits at ~98%% of the 44.0 ms gather issue floor.
    """
    hw_pad = v_ref.shape[2]
    cw = 4 * dh
    ck = min(_QC, hw_pad)
    e = (
        jax.lax.broadcasted_iota(jnp.int32, (dh, cw), 1) % dh
        == jax.lax.broadcasted_iota(jnp.int32, (dh, cw), 0)
    ).astype(jnp.float32)
    dn = (((0,), (0,)), ((), ()))
    exact_in_bf16 = v_ref.dtype == jnp.bfloat16
    if timg0_ref is not None:
        # row 0 = pixel -1: out of image, and never masked downstream for
        # m >= 1 reads (only block row ax=0 is masked), so zero it here
        timg0_ref[0:8, :] = jnp.zeros((8, cw), timg0_ref.dtype)
    for k in range(hw_pad // ck):
        t = v_ref[0, :, k * ck : (k + 1) * ck].astype(jnp.float32)
        if exact_in_bf16:
            out = jax.lax.dot_general(
                t, e, dn, preferred_element_type=jnp.float32
            )
        else:
            t_hi, t_lo = _hilo(t)
            out = jax.lax.dot_general(
                t_hi, e, dn, preferred_element_type=jnp.float32
            ) + jax.lax.dot_general(t_lo, e, dn, preferred_element_type=jnp.float32)
        timg_ref[k * ck : (k + 1) * ck, :] = out.astype(timg_ref.dtype)
        if timg0_ref is not None:
            # same block shifted one row down: timg0[m] = pixel m-1
            timg0_ref[k * ck + 1 : (k + 1) * ck + 1, :] = out.astype(
                timg0_ref.dtype
            )

    lane_group = jax.lax.broadcasted_iota(jnp.int32, (w, cw), 1) // dh

    if timg0_ref is None:
        tab_ref[...] = jnp.zeros_like(tab_ref)

        def yb(y, _):
            for g in range(4):
                dy, dx = g // 2, g % 2
                yp = y + dy - 1
                dst = y * pw + (1 - dx)

                @pl.when((yp >= 0) & (yp < h))
                def _():
                    rows = timg_ref[pl.ds(yp * w, w), :]
                    cur = tab_ref[pl.ds(dst, w), :]
                    tab_ref[pl.ds(dst, w), :] = jnp.where(
                        lane_group == g, rows, cur
                    )

            return 0

        jax.lax.fori_loop(0, h + 1, yb, 0, unroll=False)
        return

    # --- select-compose assembly ---
    zero_block = jnp.zeros((w, cw), jnp.float32)
    # block row ax=0 of the dx=0 lane groups (0 and 2) = pixel x=-1 -> 0
    ax0_dx0 = (
        jax.lax.broadcasted_iota(jnp.int32, (w, cw), 0) == 0
    ) & (lane_group % 2 == 0)
    row_group = jax.lax.broadcasted_iota(jnp.int32, (1, cw), 1) // dh

    def compose(a, b, c, d):
        top = jnp.where(lane_group == 0, a, b)  # dy=0: dx=0 / dx=1
        bot = jnp.where(lane_group == 2, c, d)  # dy=1: dx=0 / dx=1
        out = jnp.where(lane_group < 2, top, bot)
        return jnp.where(ax0_dx0, 0.0, out)

    def store_block(y, a, b, c, d):
        tab_ref[pl.ds(y * pw, w), :] = compose(a, b, c, d)

    def store_axw(y, ra, rc):
        # table row (y, ax=w): only dx=0 groups are in-image (pixel x=w-1)
        r = jnp.where(row_group == 0, ra, jnp.where(row_group == 2, rc, 0.0))
        tab_ref[pl.ds(y * pw + w, 1), :] = r

    # y = 0: dy=0 groups out of image
    c0 = timg0_ref[pl.ds(0, w), :]
    d0 = timg_ref[pl.ds(0, w), :]
    store_block(0, zero_block, zero_block, c0, d0)
    store_axw(0, jnp.zeros((1, cw), jnp.float32), timg0_ref[pl.ds(w, 1), :])

    def yb2(y, _):
        a = timg0_ref[pl.ds((y - 1) * w, w), :]
        b = timg_ref[pl.ds((y - 1) * w, w), :]
        c = timg0_ref[pl.ds(y * w, w), :]
        d = timg_ref[pl.ds(y * w, w), :]
        store_block(y, a, b, c, d)
        # pixel (y-1, w-1) = timg0[y*w]; pixel (y, w-1) = timg0[(y+1)*w]
        store_axw(y, timg0_ref[pl.ds(y * w, 1), :],
                  timg0_ref[pl.ds((y + 1) * w, 1), :])
        return 0

    jax.lax.fori_loop(1, h, yb2, 0, unroll=False)

    # y = h: dy=1 groups out of image
    ah = timg0_ref[pl.ds((h - 1) * w, w), :]
    bh_ = timg_ref[pl.ds((h - 1) * w, w), :]
    store_block(h, ah, bh_, zero_block, zero_block)
    store_axw(h, timg0_ref[pl.ds(h * w, 1), :],
              jnp.zeros((1, cw), jnp.float32))


def _build_wvec_point(wx, wy, a, wvec_ref, *, dh: int, cw: int):
    """Per-point combined (bilinear x attention) quadrant weights, expanded
    to row weights (qc, cw) on the MXU: E[c, j] = [j // dh == c]. The
    quadrant axis is carried LEADING end-to-end — a trailing size-4 axis
    would be lane-padded 4->128 by the TPU layout (32x HBM blow-up). The
    expansion dot uses the exact hi/lo split (see `_hilo`)."""
    w = jnp.concatenate(
        [
            (1 - wy) * (1 - wx) * a,
            (1 - wy) * wx * a,
            wy * (1 - wx) * a,
            wy * wx * a,
        ],
        axis=0,
    )  # (4, qc)
    e = (
        jax.lax.broadcasted_iota(jnp.int32, (4, cw), 1) // dh
        == jax.lax.broadcasted_iota(jnp.int32, (4, cw), 0)
    ).astype(jnp.float32)
    dn = (((0,), (0,)), ((), ()))
    w_hi, w_lo = _hilo(w)
    wvec_ref[:] = jax.lax.dot_general(
        w_hi, e, dn, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(w_lo, e, dn, preferred_element_type=jnp.float32)


def _gather_group(tab_ref, idx_ref, p: int, q0, rows_ref=None):
    """Gather _QGROUP table rows for one (point, query-group). Slow path:
    per-row dynamic loads concatenated into one vreg (~4.3 cycles/row, the
    ISA floor for dispersed indices). Fast path (_COALESCE, needs a
    (_QGROUP, 128) VMEM scratch `rows_ref`): if the group's indices are
    exactly consecutive, a single unaligned (_QGROUP, 128) vector load.
    The branch MUST be a pl.when pair writing the scratch — a value-level
    `lax.cond` lowers to select-of-both-paths on TPU vectors (measured 2x
    SLOWER than the plain slow path). The consecutiveness check runs on the
    scalar unit (SMEM reads), largely hidden behind the vector work."""
    slow = lambda: jnp.concatenate(
        [tab_ref[pl.ds(idx_ref[0, p, q0 + s], 1), :] for s in range(_QGROUP)],
        axis=0,
    )
    if not (_COALESCE and rows_ref is not None):
        return slow()
    i0 = idx_ref[0, p, q0]
    consec = idx_ref[0, p, q0 + 1] == i0 + 1
    for s in range(2, _QGROUP):
        consec &= idx_ref[0, p, q0 + s] == i0 + s

    @pl.when(consec)
    def _fast():
        rows_ref[...] = tab_ref[pl.ds(i0, _QGROUP), :]

    @pl.when(jnp.logical_not(consec))
    def _slow():
        rows_ref[...] = slow()

    return rows_ref[...]


def _kernel(
    idx_ref, tabt_ref, wx_ref, wy_ref, at_ref, out_ref, tab_ref, wvec_ref,
    *scratch, npts: int, dh: int, geom=None, n_real: int | None = None,
    shifted: bool = False
):
    """geom=None: tabt_ref is the channel-major HBM patch table, transposed
    to row-major in-kernel. geom=(h, w, pw): tabt_ref is the RAW value map
    (1, dh, hw_pad) and the patch table is built in-kernel (scratch carries
    the extra timg buffer — plus the shifted timg0 when `shifted`, the
    select-compose assembly). n_real bounds the gather loop on the final
    query chunk (the query pad would otherwise do real gather work on
    clipped indices — ~2.3%% of all rows at flagship shapes)."""
    qc = out_ref.shape[1]
    cw = out_ref.shape[2]

    @pl.when(pl.program_id(1) == 0)
    def _build_tab():
        if geom is None:
            _transpose_chunks(tabt_ref[0], tab_ref)
        else:
            h, w, pw = geom
            _build_table_from_v(
                tabt_ref, scratch[0], tab_ref, h=h, w=w, dh=dh, pw=pw,
                timg0_ref=scratch[1] if shifted else None,
            )

    for p in range(npts):
        _build_wvec_point(
            wx_ref[0, p : p + 1, :], wy_ref[0, p : p + 1, :],
            at_ref[0, p : p + 1, :], wvec_ref.at[p], dh=dh, cw=cw,
        )

    nsteps = qc // _QGROUP
    if n_real is not None and n_real % qc != 0:
        rows = jnp.minimum(qc, n_real - pl.program_id(1) * qc)
        nsteps = jax.lax.div(rows + (_QGROUP - 1), _QGROUP)

        # skipped pad rows must still be written: zero the partial block
        # first (one extra block write on ONE grid step), real rows are
        # overwritten by the loop below
        @pl.when(rows < qc)
        def _zero_tail():
            out_ref[...] = jnp.zeros_like(out_ref)

    rows_ref = scratch[-1] if _COALESCE else None

    def body(q8, _):
        q0 = q8 * _QGROUP
        acc = jnp.zeros((_QGROUP, cw), jnp.float32)
        for p in range(npts):
            rows = _gather_group(tab_ref, idx_ref, p, q0, rows_ref)
            acc = acc + rows.astype(jnp.float32) * wvec_ref[p, pl.ds(q0, _QGROUP), :]
        out_ref[0, pl.ds(q0, _QGROUP), :] = acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nsteps, body, 0, unroll=False)


def _sample_pallas(tabt, gidx, wx, wy, attn, npts: int, dh: int,
                   qc: int | None = None, out_dtype=jnp.float32,
                   geom=None, r_pad: int | None = None,
                   n_real: int | None = None):
    """geom=None: tabt (BH, 4*dh, R_pad) channel-major patch table.
    geom=(h, w, pw): tabt is the RAW value map (BH, dh, hw_pad) and the patch
    table (r_pad rows) is built in-kernel (pass r_pad explicitly).
    gidx (BH, npts, N_pad) int32; wx/wy/attn (BH, npts, N_pad) f32
    -> (BH, N_pad, 4*dh) pre-fold samples in out_dtype.

    VMEM budget at flagship f32 shapes (R_pad=43008): in-kernel build =
    v window 2x10 + timg 21 + tab 22 + wvec 8 + out 2x1 + weights ~0.4
    = ~65 MB (bf16 v: ~55); hbm mode = tabt window 2x22 + tab 22 + wvec 8
    + out 2 + weights ~0.4 = ~76 MB (bf16: ~54).

    Callers are expected to be inside jit (model apply); `_INTERPRET` is read
    at trace time so tests can run the kernel on CPU."""
    bh = tabt.shape[0]
    if geom is None:
        cw, r_pad = tabt.shape[1], tabt.shape[2]
    else:
        cw = 4 * dh
        assert r_pad is not None
    n_pad = gidx.shape[2]
    if qc is None:
        qc = min(_QC, n_pad)
    assert n_pad % qc == 0 and qc % _QGROUP == 0
    grid = (bh, n_pad // qc)
    # select-compose assembly needs provably aligned dynamic sublane starts
    shifted = (
        _SELECT_COMPOSE
        and geom is not None
        and geom[1] % 8 == 0
        and geom[2] % 8 == 0
    )
    kern = functools.partial(
        _kernel, npts=npts, dh=dh, geom=geom, n_real=n_real, shifted=shifted
    )
    wspec = pl.BlockSpec(
        (1, npts, qc), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM
    )
    tab_dtype = (
        jnp.bfloat16
        if (_TABLE_BF16 and geom is not None and tabt.dtype == jnp.bfloat16)
        else jnp.float32
    )
    scratch = [
        pltpu.VMEM((r_pad, cw), tab_dtype),
        pltpu.VMEM((npts, qc, cw), jnp.float32),
    ]
    if geom is not None:
        scratch.append(pltpu.VMEM((tabt.shape[2], cw), tab_dtype))
        if shifted:  # timg0: one-pixel-down copy (+8 rows store slack)
            scratch.append(pltpu.VMEM((tabt.shape[2] + 8, cw), tab_dtype))
    if _COALESCE:
        scratch.append(pltpu.VMEM((_QGROUP, cw), jnp.float32))
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, npts, qc), lambda b, i: (b, 0, i), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, tabt.shape[1], tabt.shape[2]),
                lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            wspec,
            wspec,
            wspec,
        ],
        out_specs=pl.BlockSpec(
            (1, qc, cw), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, cw), out_dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(gidx, tabt, wx, wy, attn)


def _bwd_kernel(
    idx_ref, tabt_ref, wx_ref, wy_ref, at_ref, g_ref, gtab_ref, rc_ref,
    tab_ref, wvec_ref, prod_ref, *scratch, npts: int, dh: int, geom=None,
    stripes: int = 1, n_real: int | None = None
):
    """Backward pass over one (bh, query-chunk) grid step, point-major to
    keep the weight/product scratches at one point's footprint (~1 MB).

    Accumulates ``gtab[row] += wvec_row * g_row`` (the value-table cotangent,
    exact because the cotangent is quadrant-replicated — see the gradient
    contract on the forward), and emits the per-(point, query) per-quadrant
    dot products

        rc[c, p, q] = sum_d tab[gidx[p, q], c*dh + d] * g[q, d]

    from which the caller derives d(attn)/d(lx)/d(ly) with cheap dense math.
    The lane-group reduction runs on the MXU against a 0/1 selector with the
    exact hi/lo split, so rc is exact in f32.

    geom=None (hbm mode): gtab_ref is the row-major gradient-table OUTPUT
    block, revisited across query chunks (zeroed at chunk 0); the caller
    folds it to dv in XLA. geom=(h, w, pw): the gradient table lives in a
    VMEM scratch and the quadrant fold + channel-major transpose happen in
    the kernel epilogue — gtab_ref is then the (1, dh, hw_pad) dv OUTPUT
    and the 170+ MB gradient table never crosses HBM."""
    qc = g_ref.shape[1]
    cw = g_ref.shape[2]
    gacc_ref = gtab_ref if geom is None else scratch[1]
    # Striped gradient-table copies: consecutive RMWs alternate between
    # independent scratch refs, so Mosaic no longer serializes them on a
    # may-alias load-after-store chain (the RMW chain was latency-bound at
    # ~14 cycles/row; see the A/B in scripts/bench_sampling.py). The stripes
    # are summed during the epilogue fold, which already walks every row.
    gaccs = [gacc_ref] + [scratch[2 + i] for i in range(stripes - 1)]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        if geom is None:
            _transpose_chunks(tabt_ref[0], tab_ref)
        else:
            h, w, pw = geom
            _build_table_from_v(
                tabt_ref, scratch[0], tab_ref, h=h, w=w, dh=dh, pw=pw
            )
        for gr in gaccs:
            gr[...] = jnp.zeros_like(gr)

    e = (
        jax.lax.broadcasted_iota(jnp.int32, (4, cw), 1) // dh
        == jax.lax.broadcasted_iota(jnp.int32, (4, cw), 0)
    ).astype(jnp.float32)
    dn = (((1,), (1,)), ((), ()))

    rows_ref = scratch[-1] if _COALESCE else None

    # Query-pad rows carry attn=0 -> wvec=0 -> zero RMW contributions, so
    # skipping them is exact; their rc columns are garbage but the caller
    # slices rc[..., :n]. Only the final chunk is ever partial.
    nsteps = qc // _QGROUP
    if n_real is not None and n_real % qc != 0:
        rows = jnp.minimum(qc, n_real - pl.program_id(1) * qc)
        nsteps = jax.lax.div(rows + (_QGROUP - 1), _QGROUP)

    for p in range(npts):
        _build_wvec_point(
            wx_ref[0, p : p + 1, :], wy_ref[0, p : p + 1, :],
            at_ref[0, p : p + 1, :], wvec_ref, dh=dh, cw=cw,
        )

        def body(q8, _):
            q0 = q8 * _QGROUP
            g8 = g_ref[0, pl.ds(q0, _QGROUP), :].astype(jnp.float32)
            rows = _gather_group(tab_ref, idx_ref, p, q0, rows_ref)
            prod_ref[pl.ds(q0, _QGROUP), :] = rows * g8
            gw = wvec_ref[pl.ds(q0, _QGROUP), :] * g8
            # per-row read-modify-write; sequential PER STRIPE, so same-row
            # collisions accumulate correctly (a row colliding across stripes
            # is re-merged in the epilogue sum)
            for s in range(_QGROUP):
                r = idx_ref[0, p, q0 + s]
                if geom is None:
                    gtab_ref[0, pl.ds(r, 1), :] = (
                        gtab_ref[0, pl.ds(r, 1), :] + gw[s : s + 1, :]
                    )
                else:
                    gr = gaccs[s % stripes]
                    gr[pl.ds(r, 1), :] = gr[pl.ds(r, 1), :] + gw[s : s + 1, :]
            return 0

        jax.lax.fori_loop(0, nsteps, body, 0, unroll=False)

        # lane-group reduction for this point's products
        pr = prod_ref[...]
        pr_hi, pr_lo = _hilo(pr)
        rc_ref[0, :, p] = jax.lax.dot_general(
            e, pr_hi, dn, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(e, pr_lo, dn, preferred_element_type=jnp.float32)

    if geom is not None:
        # Epilogue on the LAST query chunk: quadrant-fold the accumulated
        # gradient table back to image pixels (adjoint of the assembly in
        # `_build_table_from_v`), then transpose-with-fold on the MXU to the
        # channel-major dv output. Reuses the timg scratch as the prefold
        # buffer — its forward contents are no longer needed.
        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _fold_dv():
            h, w, pw = geom
            timg_ref = scratch[0]
            hw_pad = timg_ref.shape[0]
            # pad columns of dv (beyond h*w) are folded from stale forward
            # timg contents unless zeroed; real rows are fully overwritten
            # by the select-compose below (no full-buffer zero pass needed)
            if hw_pad > h * w:
                timg_ref[h * w :, :] = jnp.zeros(
                    (hw_pad - h * w, cw), timg_ref.dtype
                )
            lane_group = jax.lax.broadcasted_iota(jnp.int32, (w, cw), 1) // dh

            def yb(yp, _):
                # all 4 quadrant sources composed in registers, ONE store
                # per yp block (lane groups are disjoint: select == sum)
                acc = jnp.zeros((w, cw), jnp.float32)
                for gq in range(4):
                    dyq, dxq = gq // 2, gq % 2
                    src = (yp + 1 - dyq) * pw + (1 - dxq)
                    rows = gaccs[0][pl.ds(src, w), :]
                    for gr in gaccs[1:]:
                        rows = rows + gr[pl.ds(src, w), :]
                    acc = acc + jnp.where(lane_group == gq, rows, 0.0)
                timg_ref[pl.ds(yp * w, w), :] = acc
                return 0

            jax.lax.fori_loop(0, h, yb, 0, unroll=False)

            # dv_cm[d, m] = sum_g timg[m, g*dh + d]
            e4 = (
                jax.lax.broadcasted_iota(jnp.int32, (dh, cw), 1) % dh
                == jax.lax.broadcasted_iota(jnp.int32, (dh, cw), 0)
            ).astype(jnp.float32)
            dn4 = (((1,), (1,)), ((), ()))
            ckv = min(_QC, hw_pad)
            for k in range(hw_pad // ckv):
                t = timg_ref[k * ckv : (k + 1) * ckv, :]
                t_hi, t_lo = _hilo(t)
                gtab_ref[0, :, k * ckv : (k + 1) * ckv] = jax.lax.dot_general(
                    e4, t_hi, dn4, preferred_element_type=jnp.float32
                ) + jax.lax.dot_general(
                    e4, t_lo, dn4, preferred_element_type=jnp.float32
                )


def _sample_pallas_bwd(tabt, gidx, wx, wy, attn, g, npts: int, dh: int,
                       qc: int, geom=None, r_pad: int | None = None,
                       n_real: int | None = None):
    """geom=None: tabt (BH, 4*dh, R_pad) channel-major (f32/bf16);
    geom=(h, w, pw): tabt is the RAW value map (BH, dh, hw_pad), table built
    in-kernel (pass r_pad). gidx (BH, npts, N_pad) int32; wx/wy/attn
    (BH, npts, N_pad) f32; g (BH, N_pad, 4*dh) quadrant-replicated cotangent
    -> (gtab (BH, R_pad, 4*dh) f32 row-major, rc (BH, 4, npts, N_pad) f32).

    VMEM budget at flagship f32 shapes: in-kernel build = v window 2x10 +
    timg 21 + tab 22 + gtab window 2x22 + wvec 1 + prod 1 + g 2 + rc ~0.5
    = ~101 MB (bf16 v: ~86); hbm mode = tabt window 2x22 + gtab 2x22 + tab
    22 + ... = ~115 MB — the reason the scratches here are per-point."""
    bh = tabt.shape[0]
    if geom is None:
        cw, r_pad = tabt.shape[1], tabt.shape[2]
    else:
        cw = 4 * dh
        assert r_pad is not None
    n_pad = gidx.shape[2]
    assert n_pad % qc == 0 and qc % _QGROUP == 0
    grid = (bh, n_pad // qc)
    # 2-way stripe fits alongside a bf16 value-map window (~86 + 22 MB);
    # with f32 operands the budget is already ~101 MB, so stay unstriped
    stripes = 2 if (geom is not None and tabt.dtype == jnp.bfloat16) else 1
    kern = functools.partial(
        _bwd_kernel, npts=npts, dh=dh, geom=geom, stripes=stripes,
        n_real=n_real,
    )
    wspec = pl.BlockSpec(
        (1, npts, qc), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, npts, qc), lambda b, i: (b, 0, i), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, tabt.shape[1], tabt.shape[2]),
                lambda b, i: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            wspec,
            wspec,
            wspec,
            pl.BlockSpec(
                (1, qc, cw), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            (
                pl.BlockSpec(
                    (1, r_pad, cw), lambda b, i: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                )
                if geom is None
                else pl.BlockSpec(
                    (1, dh, tabt.shape[2]), lambda b, i: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ),
            pl.BlockSpec(
                (1, 4, npts, qc), lambda b, i: (b, 0, 0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            (
                jax.ShapeDtypeStruct((bh, r_pad, cw), jnp.float32)
                if geom is None
                else jax.ShapeDtypeStruct((bh, dh, tabt.shape[2]), jnp.float32)
            ),
            jax.ShapeDtypeStruct((bh, 4, npts, n_pad), jnp.float32),
        ],
        scratch_shapes=(
            [
                pltpu.VMEM((r_pad, cw), jnp.float32),
                pltpu.VMEM((qc, cw), jnp.float32),
                pltpu.VMEM((qc, cw), jnp.float32),
            ]
            + (
                [
                    pltpu.VMEM((tabt.shape[2], cw), jnp.float32),  # timg
                ]
                + [
                    pltpu.VMEM((r_pad, cw), jnp.float32)  # gradient table(s)
                    for _ in range(stripes)
                ]
                if geom is not None
                else []
            )
            + ([pltpu.VMEM((_QGROUP, cw), jnp.float32)] if _COALESCE else [])
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=124 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(gidx, tabt, wx, wy, attn, g)


def supports(dh: int) -> bool:
    """The kernel wants one-vreg rows: 4*dh == 128 (flagship dh=32)."""
    return 4 * dh == 128


def _padded_width(h: int, w: int) -> int:
    """Smallest column count >= w+1 making (h+1)*pw a multiple of 8."""
    return next(c for c in range(w + 1, w + 9) if (h + 1) * c % 8 == 0)


def _row_pad(r: int) -> int:
    """Pad the table row count so the in-kernel transpose chunks evenly:
    to a multiple of _QC when large (chunk = _QC), else to a multiple of
    128 (single chunk; lane slices must stay 128-aligned)."""
    if r > _QC:
        return -(-r // _QC) * _QC
    return -(-r // 128) * 128


def _ck(r: int) -> int:
    """Transpose chunk width for a row count padded by `_row_pad`."""
    return _QC if r > _QC else r


def _geom(lx, ly, h: int, w: int):
    """align_corners=False bilinear geometry in f32: padded-anchor row
    indices into the (h+1, pw) patch table plus fractional weights (wx, wy).

    Same math as the XLA patch path (zero padding outside, locations
    pre-clamped to [0,1] by the caller — reference
    transformer_modules.py:131,152)."""
    pw = _padded_width(h, w)
    r = (h + 1) * pw
    fx = lx.astype(jnp.float32) * w - 0.5
    fy = ly.astype(jnp.float32) * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    ax = x0.astype(jnp.int32) + 1
    ay = y0.astype(jnp.int32) + 1
    gidx = jnp.clip(ay * pw + ax, 0, r - 1)  # (BH, npts, N), per-bh rows
    return gidx, wx, wy


def _prep_cm(v, h: int, w: int):
    """Channel-major patch table tab_T (BH, 4*dh, R_pad): four quadrant-
    shifted copies of the zero-padded value map concatenated on the CHANNEL
    axis. Every tensor in this build keeps a wide trailing dim (h/w-sized),
    so nothing lane-pads in HBM; the kernel transposes per-bh to the
    row-major gather layout on the MXU. Kept in v.dtype (bf16 halves the
    HBM crossing under the mixed-precision policy — the kernel's table
    scratch and accumulation stay f32)."""
    bh, dh, hw = v.shape
    pw = _padded_width(h, w)
    xpad = pw - w  # >= 1; columns beyond w+1 are never addressed (ax <= w)
    vimg = v.reshape(bh, dh, h, w)
    vp = jnp.pad(vimg, ((0, 0), (0, 0), (1, 1), (1, xpad)))
    tabt = jnp.concatenate(
        [vp[:, :, :-1, 0:pw], vp[:, :, :-1, 1 : pw + 1],
         vp[:, :, 1:, 0:pw], vp[:, :, 1:, 1 : pw + 1]],
        axis=1,
    ).reshape(bh, 4 * dh, (h + 1) * pw)  # (BH, 4*dh, r)
    # pad rows so the transpose chunks evenly at 128-aligned lane offsets
    # (fused into the build — jnp.pad on the built table would be a copy)
    r = tabt.shape[2]
    r_pad = _row_pad(r)
    if r_pad != r:
        tabt = jnp.pad(tabt, ((0, 0), (0, 0), (0, r_pad - r)))
    return tabt


def _choose_qc(n: int) -> tuple[int, int]:
    """Query-chunk size: multiple of 128 (Mosaic block-dim rule) that divides
    n if possible (avoids pad copies); small n runs as one full-dim chunk.
    Returns (qc, n_pad)."""
    if n <= _QC:
        qc = -(-n // _QGROUP) * _QGROUP
    else:
        qc = next((q for q in range(_QC, 127, -128) if n % q == 0), _QC)
    return qc, -(-n // qc) * qc


def _pad_queries(arrs, n: int, n_pad: int):
    if n_pad == n:
        return arrs
    return [jnp.pad(a, ((0, 0), (0, 0), (0, n_pad - n))) for a in arrs]


def _hw_pad(hw: int) -> int:
    """Pad the value-map pixel count so in-kernel transpose chunks are
    128-lane-aligned: multiple of _QC when large, else of 128."""
    if hw > _QC:
        return -(-hw // _QC) * _QC
    return -(-hw // 128) * 128


def _forward_prefold(v, lx, ly, attn, h: int, w: int, keep_pad: bool = False):
    """Pre-fold output (BH, N, 4*dh): the 4 quadrant contributions live in
    separate lane groups. The caller folds them — or better, absorbs the
    fold into the next matmul's weights (see nn.transformer.FoldingDense),
    which keeps every materialized tensor at 128 lanes (a (.., dh=32)
    output would be lane-padded 4x by the TPU layout)."""
    bh, dh, hw = v.shape
    npts, n = lx.shape[1], lx.shape[2]
    gidx, wx, wy = _geom(lx, ly, h, w)
    attn32 = attn.astype(jnp.float32)

    qc, n_pad = _choose_qc(n)
    gidx, wx, wy, attn32 = _pad_queries([gidx, wx, wy, attn32], n, n_pad)

    if _TABLE_BUILD == "kernel":
        # no HBM patch table: ship the raw value map, build on-chip
        pw = _padded_width(h, w)
        hwp = _hw_pad(hw)
        vk = jnp.pad(v, ((0, 0), (0, 0), (0, hwp - hw))) if hwp != hw else v
        out128 = _sample_pallas(
            vk, gidx, wx, wy, attn32, npts, dh, qc, out_dtype=v.dtype,
            geom=(h, w, pw), r_pad=_row_pad((h + 1) * pw), n_real=n,
        )
    else:
        tabt = _prep_cm(v, h, w)
        out128 = _sample_pallas(
            tabt, gidx, wx, wy, attn32, npts, dh, qc, out_dtype=v.dtype,
            n_real=n,
        )  # (BH, N_pad, 4*dh), already in v.dtype
    if keep_pad:
        # let the consumer slice after its next matmul: slicing 1 GB of
        # prefold rows here would be a pure copy (flagship pad is 2.4%)
        return out128
    return out128[:, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def deformable_sample_combine_pallas_xy_prefold(
    v, lx, ly, attn, h: int, w: int, keep_pad: bool = False
):
    """(BH, N, 4*dh) pre-fold samples — Pallas forward.

    GRADIENT CONTRACT: the backward assumes a quadrant-REPLICATED cotangent
    (g identical across the four dh-lane groups), which holds whenever the
    output is consumed through a fold-respecting op — summing the groups, or
    nn.transformer.FoldingDense (its W rows are replicated across groups, so
    W_exp^T replicates the cotangent). Under that contract
    vjp_prefold(g) == vjp_folded(g[..., :dh]), which runs here through the
    backward Pallas kernel (`_bwd_kernel`)."""
    return _forward_prefold(v, lx, ly, attn, h, w, keep_pad)


def _fwd(v, lx, ly, attn, h, w, keep_pad):
    return _forward_prefold(v, lx, ly, attn, h, w, keep_pad), (v, lx, ly, attn)


# Flipped by tests to exercise the XLA patch-path backward (the oracle).
_BWD_IMPL = "pallas"


def _bwd_xla(h, w, res, g):
    """Oracle backward: VJP of the XLA patch path on the folded cotangent."""
    from .deformable_sampling import deformable_sample_combine_patch_xy

    v, lx, ly, attn = res
    dh = v.shape[1]
    n = lx.shape[2]
    _, vjp = jax.vjp(
        lambda vv, xx, yy, aa: deformable_sample_combine_patch_xy(
            vv, xx, yy, aa, h, w
        ),
        v, lx, ly, attn,
    )
    return vjp(g[:, :n, :dh])


def _bwd_pallas(h, w, res, g):
    """Kernel backward. Rebuilds the patch table + geometry (cheaper than
    saving them as residuals), runs `_sample_pallas_bwd`, then derives

      dattn = sum_c bilinear_c * rc_c
      dlx   = w * attn * ((1-wy)(rc1-rc0) + wy(rc3-rc2))
      dly   = h * attn * ((1-wx)(rc2-rc0) + wx(rc3-rc1))
      dv    = quadrant-fold of the row-major gtab (four shifted adds on
              lane-sliced quadrant groups)

    All math in f32; cotangents cast back to the primal dtypes at the end."""
    v, lx, ly, attn = res
    bh, dh, hw = v.shape
    npts, n = lx.shape[1], lx.shape[2]
    gidx, wx, wy = _geom(lx, ly, h, w)
    a32 = attn.astype(jnp.float32)

    qc, n_pad = _choose_qc(n)
    gidx_p, wx_p, wy_p, a32_p = _pad_queries([gidx, wx, wy, a32], n, n_pad)
    g32 = g.astype(jnp.float32)
    if g32.shape[1] != n_pad:  # keep_pad=False callers hand back N rows
        g32 = jnp.pad(g32, ((0, 0), (0, n_pad - g32.shape[1]), (0, 0)))

    if _TABLE_BUILD == "kernel":
        pw = _padded_width(h, w)
        hwp = _hw_pad(hw)
        vk = jnp.pad(v, ((0, 0), (0, 0), (0, hwp - hw))) if hwp != hw else v
        dv_cm, rc = _sample_pallas_bwd(
            vk, gidx_p, wx_p, wy_p, a32_p, g32, npts, dh, qc,
            geom=(h, w, pw), r_pad=_row_pad((h + 1) * pw), n_real=n,
        )
        dv = dv_cm[:, :, :hw]  # (BH, dh, HW), folded + transposed in-kernel
    else:
        gtab, rc = _sample_pallas_bwd(
            _prep_cm(v, h, w), gidx_p, wx_p, wy_p, a32_p, g32, npts, dh, qc,
            n_real=n,
        )

    r0, r1, r2, r3 = (rc[:, c, :, :n] for c in range(4))
    dattn = (
        (1 - wy) * (1 - wx) * r0
        + (1 - wy) * wx * r1
        + wy * (1 - wx) * r2
        + wy * wx * r3
    )
    dlx = w * a32 * ((1 - wy) * (r1 - r0) + wy * (r3 - r2))
    dly = h * a32 * ((1 - wx) * (r2 - r0) + wx * (r3 - r1))

    if _TABLE_BUILD != "kernel":
        # dv: adjoint of the table build in _prep_cm (vp zero-padded by 1
        # row/col top-left, xpad cols right; tab quadrants are shifted views)
        pw = _padded_width(h, w)
        g4 = gtab[:, : (h + 1) * pw].reshape(bh, h + 1, pw, 4 * dh)
        gvp = jnp.zeros((bh, h + 2, pw + 1, dh), jnp.float32)
        gvp = gvp.at[:, :-1, 0:pw].add(g4[..., 0 * dh : 1 * dh])
        gvp = gvp.at[:, :-1, 1 : pw + 1].add(g4[..., 1 * dh : 2 * dh])
        gvp = gvp.at[:, 1:, 0:pw].add(g4[..., 2 * dh : 3 * dh])
        gvp = gvp.at[:, 1:, 1 : pw + 1].add(g4[..., 3 * dh : 4 * dh])
        dvimg = gvp[:, 1 : 1 + h, 1 : 1 + w]  # (BH, h, w, dh)
        dv = jnp.moveaxis(dvimg.reshape(bh, hw, dh), 2, 1)  # (BH, dh, HW)
    return (
        dv.astype(v.dtype),
        dlx.astype(lx.dtype),
        dly.astype(ly.dtype),
        dattn.astype(attn.dtype),
    )


def _bwd(h, w, keep_pad, res, g):
    if _BWD_IMPL == "pallas":
        return _bwd_pallas(h, w, res, g)
    return _bwd_xla(h, w, res, g)


deformable_sample_combine_pallas_xy_prefold.defvjp(_fwd, _bwd)


def deformable_sample_combine_pallas_xy(v, lx, ly, attn, h: int, w: int):
    """Folded (BH, N, dh) output — compatibility entry over the prefold
    kernel (lane-slice fold in XLA)."""
    dh = v.shape[1]
    o = deformable_sample_combine_pallas_xy_prefold(v, lx, ly, attn, h, w)
    return (
        (o[..., 0 * dh : 1 * dh] + o[..., 1 * dh : 2 * dh])
        + (o[..., 2 * dh : 3 * dh] + o[..., 3 * dh : 4 * dh])
    )


def deformable_sample_combine_pallas(v, locs, attn, h: int, w: int):
    """(…, 2)-locs compatibility wrapper over the xy entry point."""
    return deformable_sample_combine_pallas_xy(
        v, locs[..., 0], locs[..., 1], attn, h, w
    )
