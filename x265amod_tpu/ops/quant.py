"""Quantization / dequantization (flat scaling lists).

Role of reference `common/quant.cpp:397-608` (scalar quant path) rebuilt
as batched elementwise ops (VPU work).  Dequant follows normative ITU-T
H.265 8.6.3 with m[x][y]=16 (scaling lists off); forward quant follows
the HM/x265 convention (QUANT_SHIFT=14, MAX_TR_DYNAMIC_RANGE=15).
RDOQ (the trellis) is layered on top in ops/rdoq.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

QUANT_SCALES = np.array([26214, 23302, 20560, 18396, 16384, 14564],
                        dtype=np.int64)
INV_QUANT_SCALES = np.array([40, 45, 51, 57, 64, 72], dtype=np.int64)

# chroma QP mapping for 4:2:0 (spec Table 8-10)
_CHROMA_QP_TAB = np.array([29, 30, 31, 32, 33, 33, 34, 34, 35, 35, 36, 36,
                           37, 37], dtype=np.int32)


def chroma_qp(qp_y: int, chroma_offset: int = 0) -> int:
    q = int(np.clip(qp_y + chroma_offset, 0, 57))
    if q < 30:
        return q
    if q > 43:
        return q - 6
    return int(_CHROMA_QP_TAB[q - 30])


def chroma_qp_np(qp_y: np.ndarray, chroma_offset: int = 0) -> np.ndarray:
    """Vectorized chroma QP mapping (spec Table 8-10) for per-CTU QP
    maps."""
    q = np.clip(np.asarray(qp_y, np.int32) + chroma_offset, 0, 57)
    out = np.where(q < 30, q,
                   np.where(q > 43, q - 6,
                            _CHROMA_QP_TAB[np.clip(q - 30, 0, 13)]))
    return out.astype(np.int32)


def chroma_qp_jnp(qp_y, chroma_offset: int = 0):
    """Device twin of chroma_qp_np (spec Table 8-10) for traced per-CU
    QP arrays (deblocking per-edge chroma QP under AQ)."""
    q = jnp.clip(jnp.asarray(qp_y, jnp.int32) + chroma_offset, 0, 57)
    tab = jnp.asarray(_CHROMA_QP_TAB)
    return jnp.where(q < 30, q,
                     jnp.where(q > 43, q - 6,
                               tab[jnp.clip(q - 30, 0, 13)])) \
        .astype(jnp.int32)


def quant_params(qp: int, log2_tr_size: int, bit_depth: int = 8,
                 intra: bool = True):
    """Returns (scale, qbits, offset) for forward quant."""
    transform_shift = 15 - bit_depth - log2_tr_size
    qbits = 14 + qp // 6 + transform_shift
    scale = int(QUANT_SCALES[qp % 6])
    offset = (171 if intra else 85) << (qbits - 9)
    return scale, qbits, offset


def quant_np(coeff: np.ndarray, qp: int, bit_depth: int = 8,
             intra: bool = True) -> np.ndarray:
    n = coeff.shape[-1]
    log2n = n.bit_length() - 1
    scale, qbits, offset = quant_params(qp, log2n, bit_depth, intra)
    mag = (np.abs(coeff.astype(np.int64)) * scale + offset) >> qbits
    level = np.sign(coeff) * mag
    return np.clip(level, -32768, 32767).astype(np.int32)


def dequant_np(level: np.ndarray, qp: int, bit_depth: int = 8
               ) -> np.ndarray:
    """Normative scaling process (spec 8.6.3), m=16."""
    n = level.shape[-1]
    log2n = n.bit_length() - 1
    bd_shift = bit_depth + log2n - 5
    scale = int(INV_QUANT_SCALES[qp % 6]) * 16 << (qp // 6)
    d = (level.astype(np.int64) * scale + (1 << (bd_shift - 1))) >> bd_shift
    return np.clip(d, -32768, 32767).astype(np.int32)


@functools.partial(jax.jit, static_argnames=("log2n", "bit_depth", "intra"))
def _quant_impl(coeff, qp, log2n, bit_depth, intra):
    transform_shift = 15 - bit_depth - log2n
    qbits = 14 + qp // 6 + transform_shift
    scale = jnp.asarray(QUANT_SCALES, jnp.int32)[qp % 6]
    offset = (171 if intra else 85) << (qbits - 9)
    c = coeff.astype(jnp.int64)
    mag = (jnp.abs(c) * scale + offset) >> qbits
    level = jnp.sign(c) * mag
    return jnp.clip(level, -32768, 32767).astype(jnp.int32)


def quant(coeff: jax.Array, qp, bit_depth: int = 8,
          intra: bool = True) -> jax.Array:
    """Batched forward quant of [..., N, N] transform coefficients.

    ``qp`` may be a traced scalar (per-frame / per-CU QP from rate
    control) — shifts with traced exponents are avoided by computing
    qbits on the host only when qp is concrete; traced path uses the
    jnp.right_shift with arrays.
    """
    n = coeff.shape[-1]
    log2n = n.bit_length() - 1
    if isinstance(qp, (int, np.integer)):
        return _quant_impl(coeff, int(qp), log2n, bit_depth, intra)
    # traced qp path: qp may be a scalar or an array broadcastable to
    # coeff's shape (per-CU adaptive QP) — jnp ops broadcast, lax don't
    transform_shift = 15 - bit_depth - log2n
    qbits = 14 + qp // 6 + transform_shift
    scale = jnp.asarray(QUANT_SCALES, jnp.int64)[qp % 6]
    offset = (171 if intra else 85) * \
        jnp.left_shift(jnp.int64(1), (qbits - 9).astype(jnp.int64))
    c = coeff.astype(jnp.int64)
    mag = jnp.right_shift(jnp.abs(c) * scale + offset,
                          qbits.astype(jnp.int64))
    level = jnp.sign(c) * mag
    return jnp.clip(level, -32768, 32767).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("log2n", "bit_depth"))
def _dequant_impl(level, qp, log2n, bit_depth):
    bd_shift = bit_depth + log2n - 5
    scale = jnp.asarray(INV_QUANT_SCALES, jnp.int32)[qp % 6] * 16
    scale = scale << (qp // 6)
    d = (level.astype(jnp.int64) * scale + (1 << (bd_shift - 1))) >> bd_shift
    return jnp.clip(d, -32768, 32767).astype(jnp.int32)


def dequant(level: jax.Array, qp, bit_depth: int = 8) -> jax.Array:
    n = level.shape[-1]
    log2n = n.bit_length() - 1
    if isinstance(qp, (int, np.integer)):
        return _dequant_impl(level, int(qp), log2n, bit_depth)
    bd_shift = bit_depth + log2n - 5
    scale = jnp.left_shift(
        jnp.asarray(INV_QUANT_SCALES, jnp.int64)[qp % 6] * 16,
        (qp // 6).astype(jnp.int64))
    d = (level.astype(jnp.int64) * scale + (1 << (bd_shift - 1))) >> bd_shift
    return jnp.clip(d, -32768, 32767).astype(jnp.int32)


def derive_qp_maps(qp: int, offsets, hc: int, wc: int,
                   lambda_scale: float = 1.0, cb_offset: int = 0,
                   cr_offset: int = 0):
    """Host helper: per-CTU QP maps from a frame QP + AQ/CU-tree offset
    map (None -> uniform).  Returns numpy (qp_map, qp_cb, qp_cr, lam)
    each [hc, wc].  lam is the exact x265 SSE lambda (lambda2_tab,
    reference constants.cpp:34-95) times lambda_scale."""
    from ..utils.lambdas import lambda2_of
    if offsets is None:
        qp_map = np.full((hc, wc), int(qp), np.int32)
    else:
        qp_map = np.clip(int(qp) + np.rint(np.asarray(offsets)),
                         0, 51).astype(np.int32)
        assert qp_map.shape == (hc, wc), (qp_map.shape, hc, wc)
    lam = (lambda_scale * lambda2_of(qp_map)).astype(np.float32)
    return (qp_map, chroma_qp_np(qp_map, cb_offset),
            chroma_qp_np(qp_map, cr_offset), lam)
