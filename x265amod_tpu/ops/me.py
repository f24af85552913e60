"""Motion estimation + motion compensation ops (TPU-shaped).

Role of reference `encoder/motion.cpp` (DIA/HEX/UMH/STAR searches) and
`common/ipfilter.cpp` (MC interpolation), re-designed for TPU: instead
of sequential pattern searches per PU, a dense SSD cost grid over the
full search window is computed for ALL CTUs at once as grouped
convolutions (MXU work):

    SSD(n, dy, dx) = sum(w^2) - 2*corr(w, c) + sum(c^2)

where corr is one conv_general_dilated with feature_group_count = N and
sum(w^2) is a conv with a ones filter.  argmin over the grid gives the
integer MV; fractional refinement rides on top (phase 2.1).

v1 scope: 16x16 blocks, integer luma MVs, chroma half-pel MC (4-tap
filter at the two fixed half phases), single reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# 4-tap chroma interpolation filter, phase 1/2 (spec Table 8-13, frac=4)
_CHROMA_HALF = np.array([-4, 36, 36, -4], dtype=np.int32)


@functools.partial(jax.jit, static_argnames=("search_range", "lam_shift"))
def me_ssd_grid(cur_blocks: jax.Array, ref_plane: jax.Array,
                search_range: int = 16, lam_shift: int = 0):
    """Dense SSD grids for all 16x16 blocks of a frame.

    cur_blocks: [hc, wc, 16, 16] int32 current frame blocks.
    ref_plane:  [H, W] int32 reference (unpadded; edge handling via
                clamp-padding inside).
    Returns (ssd_grid [hc*wc, S, S] f32, offsets) where S = 2R+1 and
    grid[n, dy, dx] corresponds to MV (dx - R, dy - R).
    """
    hc, wc = cur_blocks.shape[:2]
    r = search_range
    s = 2 * r + 1
    h, w = ref_plane.shape
    refp = jnp.pad(ref_plane, r, mode="edge").astype(jnp.float32)
    n = hc * wc
    cur = cur_blocks.reshape(n, 16, 16).astype(jnp.float32)

    # windows per block: [n, 16+2r, 16+2r] -- static strided slices
    win = refp.reshape(1, 1, h + 2 * r, w + 2 * r)
    # grouped correlation: input [1, n, Hw, Ww] filters [n, 1, 16, 16]
    # extract per-block windows via conv patches trick: instead, build
    # windows with lax.conv_general_dilated_patches on the padded ref
    wsz = 16 + 2 * r
    patches = jax.lax.conv_general_dilated_patches(
        win, filter_shape=(wsz, wsz), window_strides=(16, 16),
        padding="VALID")  # [1, wsz*wsz, hc, wc]
    windows = patches[0].reshape(wsz * wsz, hc * wc).T.reshape(
        n, 1, wsz, wsz)

    corr = jax.lax.conv_general_dilated(
        windows.reshape(1, n, wsz, wsz),
        cur.reshape(n, 1, 16, 16),
        window_strides=(1, 1), padding="VALID",
        feature_group_count=n,
        preferred_element_type=jnp.float32)[0]        # [n, S, S]
    ones = jnp.ones((1, 1, 16, 16), jnp.float32)
    w2 = jax.lax.conv_general_dilated(
        (windows * windows).reshape(1, n, wsz, wsz),
        jnp.tile(ones, (n, 1, 1, 1)),
        window_strides=(1, 1), padding="VALID",
        feature_group_count=n,
        preferred_element_type=jnp.float32)[0]
    c2 = jnp.sum(cur * cur, axis=(1, 2))[:, None, None]
    ssd = w2 - 2.0 * corr + c2
    return ssd


def mv_bits_estimate(dx: jax.Array, dy: jax.Array) -> jax.Array:
    """Approximate MVD rate: exp-Golomb-ish length in bits (quarter-pel
    units are 4x the integer component)."""
    def one(v):
        a = jnp.abs(v).astype(jnp.float32) * 4.0
        return 2.0 * jnp.log2(a + 1.0) + 2.0
    return one(dx) + one(dy)


@functools.partial(jax.jit, static_argnames=("search_range",))
def me_best_mv(ssd_grid: jax.Array, lam: jax.Array,
               search_range: int = 16):
    """argmin over (SSD + lam * mvbits) -> integer MV [n, 2] (mx, my)."""
    r = search_range
    s = 2 * r + 1
    off = jnp.arange(s) - r
    dy = off[:, None].repeat(s, 1)
    dx = off[None, :].repeat(s, 0)
    cost = ssd_grid + lam * mv_bits_estimate(dx, dy)[None]
    flat = cost.reshape(cost.shape[0], -1)
    idx = jnp.argmin(flat, axis=1)
    my = idx // s - r
    mx = idx % s - r
    best = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
    return jnp.stack([mx, my], axis=1).astype(jnp.int32), best


@functools.partial(jax.jit, static_argnames=("n",))
def mc_luma_int(ref_plane: jax.Array, mv: jax.Array, n: int = 16):
    """Integer-MV motion compensation for all blocks (parallel pass).

    ref_plane: [H, W] int32; mv: [hc*wc, 2] integer luma MVs.
    Returns pred [hc*wc, n, n] int32.  Out-of-frame reads use edge
    clamping (equivalent to the spec's coordinate clamp 8.5.3.3.2).
    """
    h, w = ref_plane.shape
    hc, wc = h // n, w // n
    pad = 80  # >= max |mv| + margin
    refp = jnp.pad(ref_plane, pad, mode="edge")
    nb = hc * wc
    bx = (jnp.arange(nb) % wc) * n
    by = (jnp.arange(nb) // wc) * n
    y0 = by + mv[:, 1] + pad
    x0 = bx + mv[:, 0] + pad
    ar = jnp.arange(n)
    yi = y0[:, None, None] + ar[None, :, None]
    xi = x0[:, None, None] + ar[None, None, :]
    return refp[yi, xi]


@functools.partial(jax.jit, static_argnames=("n",))
def mc_chroma_halfpel(ref_plane: jax.Array, mv_luma: jax.Array,
                      n: int = 8):
    """Chroma MC for integer luma MVs: phases are 0 or 1/2 per axis.

    ref_plane: [H/2, W/2] chroma plane; mv_luma: [nb, 2] integer luma
    MVs.  Chroma MV = luma MV / 2 -> integer part floor(mv/2), half-pel
    when mv is odd; 4-tap {-4,36,36,-4}/64 filter per spec 8.5.3.3.3.2.
    """
    h, w = ref_plane.shape
    hc, wc = h // n, w // n
    pad = 48
    refp = jnp.pad(ref_plane, pad, mode="edge").astype(jnp.int32)
    nb = hc * wc
    bx = (jnp.arange(nb) % wc) * n
    by = (jnp.arange(nb) // wc) * n
    cmx = mv_luma[:, 0] >> 1
    cmy = mv_luma[:, 1] >> 1
    fx = (mv_luma[:, 0] & 1)[:, None, None]
    fy = (mv_luma[:, 1] & 1)[:, None, None]
    y0 = by + cmy + pad - 1           # one tap of margin above/left
    x0 = bx + cmx + pad - 1
    ar = jnp.arange(n + 3)
    yi = y0[:, None, None] + ar[None, :, None]
    xi = x0[:, None, None] + ar[None, None, :]
    blk = refp[yi, xi]                 # [nb, n+3, n+3]

    t = [int(v) for v in _CHROMA_HALF]

    def hfilt(b):   # 4-tap over axis 2: [nb, rows, n]
        return sum(t[k] * b[:, :, k:k + n] for k in range(4))

    def vfilt(b):   # 4-tap over axis 1: [nb, n, cols]
        return sum(t[k] * b[:, k:k + n, :] for k in range(4))

    # spec 8.5.3.3.3.2 precision (8-bit): stage1 shift 0, stage2 shift 6,
    # final uni-pred rounding (8.5.3.3.4.2): (pred14 + 32) >> 6
    pred_ff = blk[:, 1:1 + n, 1:1 + n]
    pred_hf = (hfilt(blk)[:, 1:1 + n, :] + 32) >> 6
    pred_fv = (vfilt(blk)[:, :, 1:1 + n] + 32) >> 6
    hh = vfilt(hfilt(blk)) >> 6
    pred_hh = (hh + 32) >> 6
    pred = jnp.where(fx == 1,
                     jnp.where(fy == 1, pred_hh, pred_hf),
                     jnp.where(fy == 1, pred_fv, pred_ff))
    return jnp.clip(pred, 0, 255).astype(jnp.int32)
