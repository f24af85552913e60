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


@functools.partial(jax.jit, static_argnames=("search_range", "lam_shift",
                                              "bn"))
def me_ssd_grid(cur_blocks: jax.Array, ref_plane: jax.Array,
                search_range: int = 16, lam_shift: int = 0,
                bn: int = 16):
    """Dense SSD grids for all bn x bn blocks of a frame.

    cur_blocks: [hc, wc, bn, bn] int32 current frame blocks.
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
    cur = cur_blocks.reshape(n, bn, bn).astype(jnp.float32)

    # windows per block: [n, bn+2r, bn+2r] -- static strided slices
    win = refp.reshape(1, 1, h + 2 * r, w + 2 * r)
    # grouped correlation: input [1, n, Hw, Ww] filters [n, 1, bn, bn]
    # extract per-block windows via conv patches trick: instead, build
    # windows with lax.conv_general_dilated_patches on the padded ref
    wsz = bn + 2 * r
    patches = jax.lax.conv_general_dilated_patches(
        win, filter_shape=(wsz, wsz), window_strides=(bn, bn),
        padding="VALID")  # [1, wsz*wsz, hc, wc]
    windows = patches[0].reshape(wsz * wsz, hc * wc).T.reshape(
        n, 1, wsz, wsz)

    corr = jax.lax.conv_general_dilated(
        windows.reshape(1, n, wsz, wsz),
        cur.reshape(n, 1, bn, bn),
        window_strides=(1, 1), padding="VALID",
        feature_group_count=n,
        preferred_element_type=jnp.float32)[0]        # [n, S, S]
    ones = jnp.ones((1, 1, bn, bn), jnp.float32)
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


def _block_windows(ref_plane, mv_int, n, we, off, max_mv):
    """Gather-free per-block window fetch.

    Returns [nb, n+we, n+we] windows starting at
    (block_origin + mv_int + off) — the role of the dynamic
    refp[yi, xi] gather, re-expressed for TPU as (1) STATIC stride-n
    im2col patches of side T = n + we + 2*max_mv and (2) per-block
    one-hot row/col selection matmuls (MXU).  HLO profiling showed the
    dynamic gathers at ~50 ms/frame at 720p; the one-hot form is
    hundreds of MFLOPs.

    Caller contract: |mv_int| <= max_mv on both axes (our dense-grid ME
    produces MVs clamped to the search range).
    """
    h, w = ref_plane.shape
    hc, wc = h // n, w // n
    nb = hc * wc
    m = int(max_mv)
    out = n + we
    t = out + 2 * m
    pad = m + we + 8
    refp = jnp.pad(ref_plane, pad, mode="edge").astype(jnp.float32)
    start = pad - m + off
    rp = refp[start:, start:]
    need = (hc - 1) * n + t
    rp = rp[:need, :(wc - 1) * n + t]
    patches = jax.lax.conv_general_dilated_patches(
        rp[None, None], filter_shape=(t, t), window_strides=(n, n),
        padding="VALID")                         # [1, t*t, hc, wc]
    tiles = patches[0].reshape(t * t, nb).T.reshape(nb, t, t)
    dy = (mv_int[:, 1] + m)[:, None, None]       # [nb,1,1]
    dx = (mv_int[:, 0] + m)[:, None, None]
    it = jnp.arange(t)
    io = jnp.arange(out)
    r_sel = (it[None, None, :] == dy + io[None, :, None]) \
        .astype(jnp.float32)                     # [nb, out, t]
    c_sel = (it[None, :, None] == dx + io[None, None, :]) \
        .astype(jnp.float32)                     # [nb, t, out]
    rows = jnp.einsum("bot,btu->bou", r_sel, tiles,
                      preferred_element_type=jnp.float32)
    win = jnp.einsum("bou,bui->boi", rows, c_sel,
                     preferred_element_type=jnp.float32)
    return win.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Sub-pel interpolation (spec 8.5.3.3.3: 8-tap luma / 4-tap chroma)
# ---------------------------------------------------------------------------

# luma 8-tap filters per quarter phase (spec Table 8-11)
LUMA_FILTERS = np.array([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1],
], dtype=np.int32)

# chroma 4-tap filters per eighth phase (spec Table 8-13)
CHROMA_FILTERS = np.array([
    [0, 64, 0, 0],
    [-2, 58, 10, -2],
    [-4, 54, 16, -2],
    [-6, 46, 28, -4],
    [-4, 36, 36, -4],
    [-4, 28, 46, -6],
    [-2, 16, 54, -4],
    [-2, 10, 58, -2],
], dtype=np.int32)


def _filter_axis2(blk, taps, n):
    """8/4-tap filter along axis 2; blk [B, R, n+T-1] -> [B, R, n]."""
    t = taps.shape[0]
    return sum(int(taps[k]) * blk[:, :, k:k + n] for k in range(t))


def _filter_axis1(blk, taps, n):
    t = taps.shape[0]
    return sum(int(taps[k]) * blk[:, k:k + n, :] for k in range(t))


@functools.partial(jax.jit, static_argnames=("n", "max_mv"))
def mc_luma_qpel14(ref_plane: jax.Array, mv_qpel: jax.Array, n: int = 16,
                   max_mv: int | None = None):
    """Quarter-pel luma MC for all blocks (spec 8.5.3.3.3.1), returning
    the 14-bit intermediate prediction (before uni rounding) so that
    bi-prediction can combine two of them per 8.5.3.3.4.3.

    ref_plane [H, W] int32, mv_qpel [nb, 2].  Computes all 4x4 phase
    planes from one window per block and selects; with ``max_mv`` (the
    encoder's MV bound) the window fetch is the gather-free one-hot
    path (_block_windows); None keeps the dynamic gather (decoder /
    unbounded MVs).  8-bit precision: stage1 shift 0, stage2 shift 6.
    """
    h, w = ref_plane.shape
    hc, wc = h // n, w // n
    nb = hc * wc
    mvi = mv_qpel >> 2
    fx = mv_qpel[:, 0] & 3
    fy = mv_qpel[:, 1] & 3
    if max_mv is not None:
        blk = _block_windows(ref_plane, mvi, n, 7, -3, max_mv)
    else:
        pad = 88
        refp = jnp.pad(ref_plane, pad, mode="edge").astype(jnp.int32)
        bx = (jnp.arange(nb) % wc) * n
        by = (jnp.arange(nb) // wc) * n
        x0 = bx + mvi[:, 0] + pad - 3   # 3 taps of left/top margin
        y0 = by + mvi[:, 1] + pad - 3
        ar = jnp.arange(n + 7)
        yi = y0[:, None, None] + ar[None, :, None]
        xi = x0[:, None, None] + ar[None, None, :]
        blk = refp[yi, xi]              # [nb, n+7, n+7]

    # horizontal: 4 phase variants [nb, n+7, n]
    hs = [_filter_axis2(blk, LUMA_FILTERS[p], n) if p else
          (blk[:, :, 3:3 + n] << 6) for p in range(4)]
    hsel = jnp.stack(hs, 1)            # [nb, 4, n+7, n]
    hor = jnp.take_along_axis(
        hsel, fx[:, None, None, None], axis=1)[:, 0]  # [nb, n+7, n]
    # vertical: second stage >> 6 (first stage kept full for 8-bit)
    vs = []
    for p in range(4):
        if p == 0:
            vs.append(hor[:, 3:3 + n, :])
        else:
            vs.append(_filter_axis1(hor, LUMA_FILTERS[p], n) >> 6)
    vsel = jnp.stack(vs, 1)
    pred14 = jnp.take_along_axis(
        vsel, fy[:, None, None, None], axis=1)[:, 0]
    # when fy==0, pred14 = hor slice which is already 14-bit
    return pred14.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n", "max_mv"))
def mc_luma_qpel(ref_plane: jax.Array, mv_qpel: jax.Array, n: int = 16,
                 max_mv: int | None = None):
    """Uni-directional quarter-pel luma MC: 14-bit intermediate + final
    uni rounding (spec 8.5.3.3.4.2: (pred14 + 32) >> 6, clipped)."""
    pred14 = mc_luma_qpel14(ref_plane, mv_qpel, n, max_mv)
    return jnp.clip((pred14 + 32) >> 6, 0, 255).astype(jnp.int32)


def bi_combine(pred14_a: jax.Array, pred14_b: jax.Array) -> jax.Array:
    """Default bi-prediction combine (spec 8.5.3.3.4.3, 8-bit):
    Clip((predL0 + predL1 + 64) >> 7)."""
    return jnp.clip((pred14_a + pred14_b + 64) >> 7, 0, 255) \
        .astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n", "max_mv"))
def mc_chroma_qpel14(ref_plane: jax.Array, mv_luma_qpel: jax.Array,
                     n: int = 8, max_mv: int | None = None):
    """Chroma MC for arbitrary luma quarter-pel MVs (eighth-pel chroma,
    spec 8.5.3.3.3.2), returning the 14-bit intermediate prediction.
    ``max_mv`` bounds the CHROMA integer MV (luma_mv>>3) for the
    gather-free window path."""
    h, w = ref_plane.shape
    hc, wc = h // n, w // n
    nb = hc * wc
    mvc_x = mv_luma_qpel[:, 0]          # chroma mv in 1/8 units == luma qpel
    mvc_y = mv_luma_qpel[:, 1]
    ix = mvc_x >> 3
    iy = mvc_y >> 3
    fx = mvc_x & 7
    fy = mvc_y & 7
    if max_mv is not None:
        blk = _block_windows(ref_plane, jnp.stack([ix, iy], 1), n, 3,
                             -1, max_mv)
    else:
        pad = 56
        refp = jnp.pad(ref_plane, pad, mode="edge").astype(jnp.int32)
        bx = (jnp.arange(nb) % wc) * n
        by = (jnp.arange(nb) // wc) * n
        x0 = bx + ix + pad - 1
        y0 = by + iy + pad - 1
        ar = jnp.arange(n + 3)
        yi = y0[:, None, None] + ar[None, :, None]
        xi = x0[:, None, None] + ar[None, None, :]
        blk = refp[yi, xi]              # [nb, n+3, n+3]

    hs = [_filter_axis2(blk, CHROMA_FILTERS[p], n) if p else
          (blk[:, :, 1:1 + n] << 6) for p in range(8)]
    hor = jnp.take_along_axis(jnp.stack(hs, 1),
                              fx[:, None, None, None], 1)[:, 0]
    vs = []
    for p in range(8):
        if p == 0:
            vs.append(hor[:, 1:1 + n, :])
        else:
            vs.append(_filter_axis1(hor, CHROMA_FILTERS[p], n) >> 6)
    pred14 = jnp.take_along_axis(jnp.stack(vs, 1),
                                 fy[:, None, None, None], 1)[:, 0]
    return pred14.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n", "max_mv"))
def mc_chroma_qpel(ref_plane: jax.Array, mv_luma_qpel: jax.Array,
                   n: int = 8, max_mv: int | None = None):
    """Uni-directional chroma MC with final uni rounding."""
    pred14 = mc_chroma_qpel14(ref_plane, mv_luma_qpel, n, max_mv)
    return jnp.clip((pred14 + 32) >> 6, 0, 255).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n", "max_mv"))
def subpel_refine(ref_plane: jax.Array, cur_blocks: jax.Array,
                  mv_int: jax.Array, lam: jax.Array, n: int = 16,
                  max_mv: int | None = None):
    """Exhaustive +-2 quarter-pel refinement around the integer MV.

    Evaluates all 25 qpel positions (the reference's subme ladder does
    iterative hpel->qpel, `motion.cpp:40-55`; on TPU the full 5x5 qpel
    neighborhood is computed batched from one window).  Returns refined
    mv_qpel [nb, 2] and its SSD.
    """
    hc, wc = cur_blocks.shape[:2]
    nb = hc * wc
    cur = cur_blocks.reshape(nb, n, n)
    h, w = ref_plane.shape
    if max_mv is not None:
        blk = _block_windows(ref_plane, mv_int, n, 8, -4, max_mv)
    else:
        pad = 88
        refp = jnp.pad(ref_plane, pad, mode="edge").astype(jnp.int32)
        bx = (jnp.arange(nb) % wc) * n
        by = (jnp.arange(nb) // wc) * n
        # window covers int offsets {-1, 0} plus filter taps: start -4
        x0 = bx + mv_int[:, 0] + pad - 4
        y0 = by + mv_int[:, 1] + pad - 4
        ar = jnp.arange(n + 8)
        yi = y0[:, None, None] + ar[None, :, None]
        xi = x0[:, None, None] + ar[None, None, :]
        blk = refp[yi, xi]              # [nb, n+8, n+8]

    # candidate axis positions (qpel delta): -2..2 -> (int_off, phase)
    deltas = [(-2, -1, 2), (-1, -1, 3), (0, 0, 0), (1, 0, 1), (2, 0, 2)]
    hs = []
    for dq, io, ph in deltas:
        base = 4 + io - 3               # window col of tap 0
        sub = blk[:, :, base:base + n + 7]
        if ph == 0:
            hs.append(sub[:, :, 3:3 + n] << 6)
        else:
            hs.append(_filter_axis2(sub, LUMA_FILTERS[ph], n))
    costs = []
    mvs = []
    for yi_, (dqy, ioy, phy) in enumerate(deltas):
        basey = 4 + ioy - 3
        for xi_, (dqx, _, _) in enumerate(deltas):
            hor = hs[xi_][:, basey:basey + n + 7, :]
            if phy == 0:
                pred14 = hor[:, 3:3 + n, :]
            else:
                pred14 = _filter_axis1(hor, LUMA_FILTERS[phy], n) >> 6
            pred = jnp.clip((pred14 + 32) >> 6, 0, 255)
            ssd = jnp.sum((pred - cur) ** 2, axis=(1, 2)) \
                .astype(jnp.float32)
            costs.append(ssd)
            mvs.append((dqx, dqy))
    cost = jnp.stack(costs, 1)          # [nb, 25]
    dmv = jnp.asarray(mvs, jnp.int32)   # [25, 2]
    mvq_base = mv_int * 4
    cand_mv = mvq_base[:, None, :] + dmv[None]
    rate = _mvd_bits_f(cand_mv)
    best = jnp.argmin(cost + lam * rate, axis=1)
    mv_out = jnp.take_along_axis(cand_mv, best[:, None, None], 1)[:, 0]
    ssd_out = jnp.take_along_axis(cost, best[:, None], 1)[:, 0]
    return mv_out, ssd_out


def _mvd_bits_f(mvd):
    a = jnp.abs(mvd).astype(jnp.float32)
    egv = jnp.maximum(a - 2.0, 0.0)
    kf = jnp.floor(jnp.log2(egv / 2.0 + 1.0)) + 1.0
    per = jnp.where(a == 0, 1.0, jnp.where(a == 1, 3.0, 3.0 + 2.0 * kf))
    return jnp.sum(per, axis=-1)
