"""Fused LN -> FFN(gelu) -> residual -> LN Pallas kernel (inference path).

The BEV transformer encoder's post-attention tail (reference
transformer_modules.py:170-215: norm1, linear1, gelu, linear2, residual,
norm2) is HBM-bound under XLA at (B, 40k, 256) shapes: the 1024-wide hidden
activation alone is ~492 MB bf16 per flagship batch, written and re-read,
plus separate norm round-trips. This kernel streams row blocks through VMEM
and runs both matmuls on the MXU with the hidden resident on-chip — HBM
sees exactly one read of the input and one write of the output.

Inference-only: the training path keeps the XLA modules (dropout + autodiff
need no custom kernel; the train step is dominated by the sampling
backward). Layer norms and gelu compute in f32 regardless of the model's
compute dtype; matmul operands are cast to the compute dtype so the MXU
behavior matches the XLA path's `nn.Dense(dtype=...)`.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows per grid step (multiple of 16 so bf16 blocks tile evenly).
# r4 sweep at flagship shapes (scripts/bench_ffn_sweep.py, v5e): 960 2.80 ms,
# 2000 2.64, 3200 2.58, 4800 3.31, 8000 5.49 — 3200 balances per-step
# overhead against VMEM pressure on the pipelined hidden chunks.
_QN = 3200
# Flipped by tests to run in the Pallas interpreter on CPU.
_INTERPRET = False
# Process-wide off switch (tests / ablation).
_ENABLED = True


def supports(c: int, f: int) -> bool:
    return c % 128 == 0 and f % 128 == 0


# XLA's f32 erf rational approximation (xla ErfImpl32) — Mosaic has no erf
# primitive, and this is exactly what `lax.erf` lowers to for f32, so the
# fused path matches the XLA modules to float ulps.
_ERF_ALPHA = (
    -2.72614225801306e-10, 2.77068142495902e-08, -2.10102402082508e-06,
    -5.69250639462346e-05, -7.34990630326855e-04, -2.95459980854025e-03,
    -1.60960333262415e-02,
)
_ERF_BETA = (
    -1.45660718464996e-05, -2.13374055278905e-04, -1.68282697438203e-03,
    -7.37332916720468e-03, -1.42647390514189e-02,
)


def _erf_f32(x):
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    p = jnp.float32(_ERF_ALPHA[0])
    for a in _ERF_ALPHA[1:]:
        p = p * x2 + a
    q = jnp.float32(_ERF_BETA[0])
    for b in _ERF_BETA[1:]:
        q = q * x2 + b
    return (x * p) / q


def _gelu_erf(x):
    """Exact-erf gelu in f32 (torch F.gelu default — reference uses it)."""
    return 0.5 * x * (1.0 + _erf_f32(x * (1.0 / math.sqrt(2.0))))


def _ln(x, scale, bias, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    d = x - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    return d * jax.lax.rsqrt(var + eps) * scale + bias


# Hidden-dim chunk width for the software-pipelined kernel body: the gelu of
# chunk k (VPU) overlaps the first matmul of chunk k+1 (MXU). 0 disables.
# A/B on v5e (B=6 flagship shapes): none 2.94 ms, 512 2.65, 256 2.52,
# 128 2.27 — the erf polynomial hides almost fully under the MXU at 128.
_FCHUNK = 128


def _kernel(
    u_ref, w1_ref, b1_ref, w2_ref, b2_ref, s1_ref, o1_ref, s2_ref, o2_ref,
    out_ref, *, eps: float, cdt,
):
    u = u_ref[...].astype(jnp.float32)  # (QN, C)
    s = _ln(u, s1_ref[...].astype(jnp.float32), o1_ref[...].astype(jnp.float32), eps)
    sc = s.astype(cdt)
    dn = (((1,), (0,)), ((), ()))
    f = w1_ref.shape[1]
    if _FCHUNK and f % _FCHUNK == 0 and f // _FCHUNK > 1:
        # Software pipeline over hidden chunks: issue mm1 for chunk k+1
        # before running gelu on chunk k, so the VPU's erf polynomial hides
        # under the MXU's matmuls instead of serializing between them.
        nk = f // _FCHUNK

        def mm1(k):
            # b1 arrives (nk, _FCHUNK): chunk k's bias is a sublane row at
            # lane offset 0 (a lane-offset slice of a (1, F) row is a layout
            # Mosaic cannot broadcast).
            return jax.lax.dot_general(
                sc, w1_ref[:, k * _FCHUNK : (k + 1) * _FCHUNK], dn,
                preferred_element_type=jnp.float32,
            ) + b1_ref[k : k + 1, :].astype(jnp.float32)

        def mm2(g, k):
            return jax.lax.dot_general(
                g.astype(cdt), w2_ref[k * _FCHUNK : (k + 1) * _FCHUNK, :], dn,
                preferred_element_type=jnp.float32,
            )

        h = mm1(0)
        y = jnp.zeros_like(s)
        for k in range(nk):
            h_next = mm1(k + 1) if k + 1 < nk else None
            g = _gelu_erf(h)
            y = y + mm2(g, k)
            h = h_next
        y = y + b2_ref[...].astype(jnp.float32)
    else:
        h = jax.lax.dot_general(
            sc, w1_ref[...], dn, preferred_element_type=jnp.float32,
        ) + b1_ref[...].astype(jnp.float32)
        h = _gelu_erf(h)
        y = jax.lax.dot_general(
            h.astype(cdt), w2_ref[...], dn, preferred_element_type=jnp.float32,
        ) + b2_ref[...].astype(jnp.float32)
    r = s + y
    out = _ln(r, s2_ref[...].astype(jnp.float32), o2_ref[...].astype(jnp.float32), eps)
    out_ref[...] = out.astype(out_ref.dtype)


def _choose_qn(bn: int) -> tuple[int, int]:
    for q in range(_QN, 15, -16):
        if bn % q == 0:
            return q, bn
    return _QN, -(-bn // _QN) * _QN


def fused_ffn_ln(u, w1, b1, w2, b2, scale1, bias1, scale2, bias2,
                 eps: float = 1e-6, compute_dtype=jnp.bfloat16):
    """u (B, N, C) -> LN2(LN1(u) + FFN(LN1(u))), all in one kernel.

    Weights arrive in the flax layout: w1 (C, F), w2 (F, C); norm params
    (C,). Output dtype follows u."""
    b, n, c = u.shape
    f = w1.shape[1]
    bn = b * n
    qn, bn_pad = _choose_qn(bn)
    u2 = u.reshape(bn, c)
    if bn_pad != bn:
        u2 = jnp.pad(u2, ((0, bn_pad - bn), (0, 0)))

    cdt = compute_dtype
    row = lambda v: v.reshape(1, -1).astype(cdt)
    pipelined = bool(_FCHUNK) and f % _FCHUNK == 0 and f // _FCHUNK > 1
    b1_shape = (f // _FCHUNK, _FCHUNK) if pipelined else (1, f)
    kern = functools.partial(_kernel, eps=eps, cdt=cdt)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(bn_pad // qn,),
        in_specs=[
            pl.BlockSpec((qn, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            full((c, f)),
            full(b1_shape),
            full((f, c)),
            full((1, c)),
            full((1, c)),
            full((1, c)),
            full((1, c)),
            full((1, c)),
        ],
        out_specs=pl.BlockSpec((qn, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bn_pad, c), u.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(u2, w1.astype(cdt), b1.reshape(b1_shape).astype(cdt), w2.astype(cdt), row(b2),
      row(scale1), row(bias1), row(scale2), row(bias2))
    if bn_pad != bn:
        out = out[:bn]
    return out.reshape(b, n, c)


def enabled_for_backend() -> bool:
    """The fused tail runs on TPU (or under the interpreter in tests)."""
    return _ENABLED and (_INTERPRET or jax.default_backend() != "cpu")
