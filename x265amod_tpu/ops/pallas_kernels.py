"""Pallas TPU kernels for the transform/quant inner loop.

The encoder's hottest op chain is forward DCT -> quant over large
batches of residual blocks (every intra-mode trial and inter trial runs
it; role of reference `common/dct.cpp` + `common/quant.cpp:397` whose
hot paths are x86 asm, `common/x86/dct8.asm`).  The XLA path
(`ops/transforms.py` + `ops/quant.py`) is two batched int32 matmuls
with an elementwise epilogue; XLA materializes the stage-1 intermediate
in HBM between them.  This kernel keeps one tile of blocks resident in
VMEM through both matmul stages and the quant epilogue — one HBM read
(residual) and one HBM write (levels) per block.

Layout: [B, N, N] int32 residual blocks are processed in grid tiles of
TB blocks; each stage is a [TB*N, N] x [N, N] matmul (MXU, int32
accumulation is exact for the HEVC dynamic range).  Per-block quant
parameters (scale/offset/qbits vary per block under AQ) ride along as
[B] vectors.

Use `fused_fwd_quant(resi, qp_blk, ...)` as a drop-in for
`quant(fwd_transform(resi), qp)`; correctness is asserted against the
numpy oracle in tests/test_pallas_kernels.py (checkasm analog).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import QUANT_SCALES
from .transforms import DST4, dct_matrix

_INTERPRET = False  # flipped by tests on CPU


def _round_shift(x, s):
    return (x + (1 << (s - 1))) >> s


def _fused_kernel(resi_ref, scale_ref, offs_ref, qbits_ref, t_ref,
                  tt_ref, out_ref, *, n, tb, s1, s2):
    """One grid step: TB blocks of NxN residual -> quantized levels."""
    # per-block params arrive as [tb, 1] blocks (rank-2: rank-1 blocks
    # violate the TPU lane-tiling constraint for tb < 128).
    # Matmuls run in f32 (Mosaic has no i32 MXU path); stage 1 operands
    # fit f32 exactly (|r| < 2^9, sums < 2^24); stage 2's 17-bit
    # intermediates are split hi/lo so every partial sum stays < 2^24.
    r = resi_ref[...].reshape(tb * n, n).astype(jnp.float32)
    tmp = jax.lax.dot_general(
        r, tt_ref[...].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    tmp = _round_shift(tmp, s1)
    hi = tmp >> 8
    lo = tmp - (hi << 8)
    tf = t_ref[...].astype(jnp.float32)
    dims = (((1,), (1,)), ((), ()))

    def stage2(x):
        return jax.lax.dot_general(
            x.reshape(tb, n, n).astype(jnp.float32), tf, dims,
            preferred_element_type=jnp.float32)

    coeff = (stage2(hi) * 256.0 + stage2(lo)).astype(jnp.int32)
    coeff = _round_shift(coeff, s2).transpose(0, 2, 1)  # [tb, u, x]
    # quant epilogue (per-block scale/offset/qbits)
    sc = scale_ref[...].reshape(tb, 1, 1)
    off = offs_ref[...].reshape(tb, 1, 1)
    qb = qbits_ref[...].reshape(tb, 1, 1)
    mag = jnp.right_shift(jnp.abs(coeff) * sc + off, qb)
    lvl = jnp.clip(jnp.sign(coeff) * mag, -32768, 32767)
    out_ref[...] = lvl.reshape(tb, n, n)


@functools.partial(jax.jit,
                   static_argnames=("use_dst", "bit_depth", "intra"))
def fused_fwd_quant(resi: jax.Array, qp_blk: jax.Array,
                    use_dst: bool = False, bit_depth: int = 8,
                    intra: bool = True) -> jax.Array:
    """Fused forward transform + quant: resi [B, N, N] int32, qp_blk
    [B] int32 -> levels [B, N, N] int32.  Equals
    quant(fwd_transform(resi, use_dst), qp) elementwise."""
    b, n, _ = resi.shape
    log2n = n.bit_length() - 1
    s1 = log2n + bit_depth - 9
    s2 = log2n + 6
    t = jnp.asarray(DST4 if use_dst else dct_matrix(n), jnp.int32)
    transform_shift = 15 - bit_depth - log2n
    qbits = (14 + qp_blk // 6 + transform_shift).astype(jnp.int32)
    scale = jnp.asarray(QUANT_SCALES, jnp.int32)[qp_blk % 6]
    base = jnp.int32(171 if intra else 85)
    offs = jnp.left_shift(base, qbits - 9)

    # tile blocks so each grid step's stage-1 matmul is >= 256 rows
    tb = max(1, 256 // n)
    pad = (-b) % tb
    if pad:
        resi = jnp.concatenate(
            [resi, jnp.zeros((pad, n, n), resi.dtype)], 0)
        qbits = jnp.concatenate([qbits, jnp.ones((pad,), jnp.int32)], 0)
        scale = jnp.concatenate([scale, jnp.ones((pad,), jnp.int32)], 0)
        offs = jnp.concatenate([offs, jnp.zeros((pad,), jnp.int32)], 0)
    bp = b + pad
    grid = (bp // tb,)
    kernel = functools.partial(_fused_kernel, n=n, tb=tb, s1=s1, s2=s2)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, n, n), jnp.int32),
        interpret=_INTERPRET,
    )(resi.astype(jnp.int32), scale[:, None], offs[:, None],
      qbits[:, None], t, t.T)
    return out[:b]
