"""Fused BEV seg-head Pallas kernel (inference path).

The BEVEncoderTransformer seg head (reference model_vovnet_transformer.py:
125-173: Conv3x3(256->128)+BN+ReLU, Conv3x3(128->64)+BN+ReLU, Conv1x1(64->4))
runs at ~31% MXU efficiency under XLA at (B, 200, 200) shapes and round-trips
two big intermediates through HBM (123 + 61 MB bf16 at B=6). This kernel
processes one batch element per grid step with the whole 200x200 image
resident in VMEM:

  * the input is copied once into a zero-padded scratch (the SAME-conv halo),
    so each 3x3 conv is NINE shifted (chunk, cin) @ (cin, cout) MXU dots
    accumulated in registers, chunked over rows (whole-array epilogues
    explode Mosaic compile time) — no im2col tensor, no HBM intermediates;
  * inference BatchNorm is folded into the conv weights/bias outside the
    kernel (W' = W * gamma/sqrt(var+eps), b' = (b - mean)*scale + beta) —
    exactly the running-stats affine the XLA path applies;
  * padded positions are re-zeroed after each bias+ReLU (the bias would
    otherwise leak into the next conv's halo), which reproduces zero padding
    for the second conv;
  * the 1x1 head is a channel-major dot emitting (8, n) — slicing the 4
    valid channels and cropping the halo happens in XLA on the tiny output.

bf16 compute only (the f32 working set does not fit VMEM); the f32 model
path keeps the XLA modules. Inference-only: training uses the XLA modules
(autodiff + batch-stats updates).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Flipped by tests to run in the Pallas interpreter on CPU.
_INTERPRET = False
# Process-wide off switch (tests / ablation).
_ENABLED = True

def supports(h: int, w: int, cin: int, mid1: int, mid2: int, out: int) -> bool:
    """Flagship seg-head shapes: lane-aligned channels, 4-class head."""
    return cin == 256 and mid1 == 128 and mid2 <= 128 and out <= 8


def enabled_for_backend() -> bool:
    return _ENABLED and (_INTERPRET or jax.default_backend() != "cpu")


def _pwp(w: int) -> int:
    return -(-(w + 2) // 8) * 8


# Rows per chunk of the conv loops: multiple of 128 (the head's lane store)
# and small enough that per-chunk values stay register/VMEM-friendly —
# whole-array (42016, 128) epilogues explode Mosaic compile time (same
# lesson as deformable_pallas._transpose_chunks). r4 sweep at flagship
# shapes (v5e): 256 1.93 ms, 512 1.75, 768 1.68, 1024 1.71, 2048 1.85,
# 4096 1.82, 8192 2.25 — 1024 sits in the flat minimum.
_CH = 1024


def _kernel(x_ref, w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
            xp_ref, y0_ref, *, h: int, w: int, cdt):
    # Padded layout: image pixel (y, x) lives at m = (y+1)*pwp + x — the
    # row START is 8-aligned (pwp % 8 == 0), which Mosaic requires for the
    # dynamic vector stores below. There is no separate left-pad column: the
    # dx=-1 tap at x=0 reads the PREVIOUS row's right-pad zeros (pwp >= w+2
    # guarantees at least two zero columns between consecutive rows).
    pwp = _pwp(w)
    n = (h + 2) * pwp
    n_pad = -(-n // _CH) * _CH
    base = pwp + 8  # 8-aligned halo guard (pwp % 8 == 0)

    xp_ref[...] = jnp.zeros_like(xp_ref)
    y0_ref[...] = jnp.zeros_like(y0_ref)

    def cp(y, _):
        xp_ref[pl.ds(base + (y + 1) * pwp, w), :] = x_ref[0, pl.ds(y * w, w), :]
        return 0

    jax.lax.fori_loop(0, h, cp, 0, unroll=False)

    dn = (((1,), (0,)), ((), ()))
    iota = jax.lax.broadcasted_iota(jnp.int32, (_CH, 1), 0)

    def _interior(m0):
        # pad rows/cols must stay zero through bias+ReLU — they are the
        # next conv's zero padding
        mi = iota + m0
        yy = mi // pwp
        xx = mi - yy * pwp
        return (yy >= 1) & (yy <= h) & (xx < w)

    def _conv_chunk(src_ref, w_ref, m0):
        # Mosaic requires dynamic vector loads to start at a multiple of 8,
        # so per dy we load one 8-aligned widened block and take the three
        # dx shifts as STATIC (in-register) slices of the value.
        acc = jnp.zeros((_CH, 128), jnp.float32)
        for dy in (-1, 0, 1):
            wide = src_ref[pl.ds(base + m0 + dy * pwp - 8, _CH + 16), :]
            for dx in (-1, 0, 1):
                t = (dy + 1) * 3 + (dx + 1)
                src = jax.lax.slice_in_dim(wide, 8 + dx, 8 + dx + _CH, axis=0)
                acc = acc + jax.lax.dot_general(
                    src, w_ref[t], dn, preferred_element_type=jnp.float32
                )
        return acc

    def c1(c, _):
        m0 = c * _CH
        acc = _conv_chunk(xp_ref, w0_ref, m0)
        y0_ref[pl.ds(base + m0, _CH), :] = jnp.where(
            _interior(m0), jnp.maximum(acc + b0_ref[...], 0.0), 0.0
        ).astype(cdt)
        return 0

    jax.lax.fori_loop(0, n_pad // _CH, c1, 0, unroll=False)

    def c2(c, _):
        m0 = c * _CH
        acc = _conv_chunk(y0_ref, w1_ref, m0)
        y1 = jnp.where(_interior(m0), jnp.maximum(acc + b1_ref[...], 0.0), 0.0)
        # 1x1 head, channel-major output (halo positions carry garbage and
        # are cropped by the caller)
        out_ref[0, :, pl.ds(m0, _CH)] = jax.lax.dot_general(
            w2_ref[...], y1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[...][:, 0:1]
        return 0

    jax.lax.fori_loop(0, n_pad // _CH, c2, 0, unroll=False)


def fused_seg_head(x, w0, b0, w1, b1, w2, b2, h: int, w: int):
    """x (B, h*w, 256) in bf16 (NHWC flattened); w0 (3,3,256,128) /
    w1 (3,3,128,<=128) BN-folded conv kernels; b0/b1 folded biases; w2
    (<=128, <=8) 1x1 head; b2 (<=8,). All weight/bias args f32.

    Returns (B, h, w, out) f32 seg logits (caller casts to the model dtype).

    VMEM at flagship shapes (200x200): x window 2x20.5 (bf16) + xp 22.2
    (bf16) + y0 11.1 (bf16) + out 2x1.4 + weights ~1.5 = ~78 MB.

    Measured (v5e, B=6 bf16, scan-amortized): 1.66 ms vs 3.50 ms for the
    XLA conv path — 2.1x; ~60% MXU efficiency on the folded convs.
    """
    b, hw, cin = x.shape
    assert hw == h * w
    cdt = x.dtype
    pwp = _pwp(w)
    n = (h + 2) * pwp
    n_pad = -(-n // _CH) * _CH
    base = pwp + 8
    ext = n_pad + base + pwp + 16

    mid1 = w0.shape[3]
    mid2 = w1.shape[3]
    out_c = w2.shape[1]
    # pad conv2 outputs and the head to lane/sublane-aligned widths
    w1p = jnp.zeros((3, 3, mid1, 128), jnp.float32).at[:, :, :, :mid2].set(w1)
    b1p = jnp.zeros((128,), jnp.float32).at[:mid2].set(b1)
    w2p = jnp.zeros((8, 128), jnp.float32).at[:out_c, :mid2].set(w2.T)
    b2p = jnp.zeros((8,), jnp.float32).at[:out_c].set(b2)

    kern = functools.partial(_kernel, h=h, w=w, cdt=cdt)
    outp = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hw, cin), lambda b_: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, mid1), lambda b_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mid1), lambda b_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, mid1, 128), lambda b_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda b_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda b_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), lambda b_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, n_pad), lambda b_: (b_, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 8, n_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ext, cin), cdt),   # zero-padded input
            pltpu.VMEM((ext, 128), cdt),   # conv1 output (padded)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(
        x,
        w0.reshape(9, cin, mid1).astype(cdt),
        b0[None, :],
        w1p.reshape(9, mid1, 128).astype(cdt),
        b1p[None, :],
        w2p,
        b2p[:, None],
    )
    img = outp[:, :out_c, :n].reshape(b, out_c, h + 2, pwp)[:, :, 1 : 1 + h, 0:w]
    return jnp.transpose(img, (0, 2, 3, 1))


def fold_conv_bn(kernel, conv_bias, gamma, beta, mean, var, eps: float = 1e-5):
    """Inference BN folded into the preceding conv (all f32)."""
    s = gamma / jnp.sqrt(var + eps)
    kf = kernel * s[None, None, None, :]
    bias = conv_bias if conv_bias is not None else 0.0
    bf = (bias - mean) * s + beta
    return kf, bf
