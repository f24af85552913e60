"""Reference (numpy, scalar-exact) HEVC intra prediction — spec 8.4.4.2.

This is the oracle for the batched JAX/Pallas intra kernels
(ops/intra.py) and the predictor used by the conformance decoder
(verify/decoder.py).  Covers: reference sample substitution (8.4.4.2.2),
[1 2 1] smoothing filter (8.4.4.2.3), planar (8.4.4.2.4), DC (8.4.4.2.5)
and the 33 angular modes (8.4.4.2.6) with luma post-filters.

Reference behavior parity: `common/intrapred.cpp` + `common/predict.cpp`
(initAdiPattern/fillReferenceSamples) — re-derived from the spec.
"""

from __future__ import annotations

import numpy as np

# intraPredAngle per mode 2..34 (spec Table 8-5)
ANGLES = {m: a for m, a in zip(range(2, 35),
          [32, 26, 21, 17, 13, 9, 5, 2, 0, -2, -5, -9, -13, -17, -21, -26,
           -32, -26, -21, -17, -13, -9, -5, -2, 0, 2, 5, 9, 13, 17, 21,
           26, 32])}
# invAngle per mode 11..25 (spec Table 8-6)
INV_ANGLES = {m: ia for m, ia in zip(range(11, 26),
              [-4096, -1638, -910, -630, -482, -390, -315, -256, -315,
               -390, -482, -630, -910, -1638, -4096])}


def ref_sample_substitution(top: np.ndarray, left: np.ndarray, corner: int,
                            avail_top: np.ndarray, avail_left: np.ndarray,
                            avail_corner: bool, bit_depth: int = 8):
    """Spec 8.4.4.2.2: fill unavailable reference samples.

    top: [2N] samples p[x][-1], left: [2N] samples p[-1][y], corner
    p[-1][-1]; avail_* boolean masks.  Returns filled (top, left, corner).
    """
    n2 = len(top)
    # scan order: left[n2-1] .. left[0], corner, top[0] .. top[n2-1]
    vals = np.concatenate([left[::-1], [corner], top])
    avail = np.concatenate([avail_left[::-1], [avail_corner], avail_top])
    if not avail.any():
        fill = 1 << (bit_depth - 1)
        return (np.full(n2, fill, top.dtype), np.full(n2, fill, left.dtype),
                fill)
    out = vals.copy()
    if not avail[0]:
        first = np.argmax(avail)
        out[0] = vals[first]
    for i in range(1, len(out)):
        if not avail[i]:
            out[i] = out[i - 1]
    left_f = out[:n2][::-1].copy()
    corner_f = int(out[n2])
    top_f = out[n2 + 1:].copy()
    return top_f, left_f, corner_f


def filter_flag(mode: int, n: int, c_idx: int) -> bool:
    """Spec 8.4.4.2.3 filterFlag (strong smoothing handled separately)."""
    if c_idx != 0 or n == 4:
        return False
    if mode == 1:  # DC
        return False
    if mode == 0:  # planar
        return n in (8, 16, 32)
    min_dist = min(abs(mode - 26), abs(mode - 10))
    thres = {8: 7, 16: 1, 32: 0}[n]
    return min_dist > thres


def smooth_refs(top: np.ndarray, left: np.ndarray, corner: int):
    """[1 2 1]/4 filter along the reference scan (spec 8.4.4.2.3)."""
    n2 = len(top)
    seq = np.concatenate([left[::-1], [corner], top]).astype(np.int64)
    out = seq.copy()
    out[1:-1] = (seq[:-2] + 2 * seq[1:-1] + seq[2:] + 2) >> 2
    return (out[n2 + 1:].astype(top.dtype), out[:n2][::-1].astype(left.dtype),
            int(out[n2]))


def predict_mode(mode: int, top: np.ndarray, left: np.ndarray, corner: int,
                 n: int, c_idx: int = 0, bit_depth: int = 8) -> np.ndarray:
    """Predict one NxN block for one mode from *already filtered* refs.

    Returns pred[y][x].  Caller is responsible for applying smooth_refs
    when filter_flag() says so.
    """
    maxv = (1 << bit_depth) - 1
    t = top.astype(np.int64)
    le = left.astype(np.int64)
    if mode == 0:  # planar, 8.4.4.2.4
        x = np.arange(n)
        y = np.arange(n)
        xx, yy = np.meshgrid(x, y)  # [y][x]
        pred = ((n - 1 - xx) * le[yy] + (xx + 1) * t[n]
                + (n - 1 - yy) * t[xx] + (yy + 1) * le[n] + n)
        return (pred >> (int(np.log2(n)) + 1)).astype(np.int32)
    if mode == 1:  # DC, 8.4.4.2.5
        dc = (int(t[:n].sum() + le[:n].sum()) + n) >> (int(np.log2(n)) + 1)
        pred = np.full((n, n), dc, dtype=np.int64)
        if c_idx == 0 and n < 32:
            pred[0, 0] = (le[0] + 2 * dc + t[0] + 2) >> 2
            pred[0, 1:] = (t[1:n] + 3 * dc + 2) >> 2
            pred[1:, 0] = (le[1:n] + 3 * dc + 2) >> 2
        return pred.astype(np.int32)
    # angular, 8.4.4.2.6
    angle = ANGLES[mode]
    vertical = mode >= 18
    main = t if vertical else le
    side = le if vertical else t
    # build main reference array ref[x], x in [-n .. 2n] (+1 pad slot for
    # the zero-weight second tap when iFact == 0 at the array end)
    ref = np.zeros(3 * n + 2, dtype=np.int64)
    ref[n] = corner
    ref[n + 1:3 * n + 1] = main[:2 * n]
    ref[3 * n + 1] = main[2 * n - 1]
    if angle < 0:
        inv = INV_ANGLES[mode]
        # extend down to ((n*angle)>>5)+1: the bound position itself is
        # never read (its interpolation weight is always 0)
        lo = ((n * angle) >> 5) + 1
        for x in range(-1, lo - 1, -1):
            idx = ((x * inv + 128) >> 8) - 1  # index into side, -1 = corner
            ref[n + x] = corner if idx < 0 else side[idx]
    pos = np.arange(1, n + 1) * angle
    i_idx = pos >> 5
    i_fact = pos & 31
    pred = np.zeros((n, n), dtype=np.int64)
    for k in range(n):  # k = y for vertical, x for horizontal
        base = n + i_idx[k]
        row = ((32 - i_fact[k]) * ref[base + 1:base + 1 + n]
               + i_fact[k] * ref[base + 2:base + 2 + n] + 16) >> 5
        pred[k] = row
    if not vertical:
        pred = pred.T
    if c_idx == 0 and n < 32:
        if mode == 26:  # pure vertical: filter first column
            col = t[0] + ((le[:n] - corner) >> 1)
            pred[:, 0] = np.clip(col, 0, maxv)
        elif mode == 10:  # pure horizontal: filter first row
            row = le[0] + ((t[:n] - corner) >> 1)
            pred[0, :] = np.clip(row, 0, maxv)
    return pred.astype(np.int32)


def predict_all_modes(top: np.ndarray, left: np.ndarray, corner: int,
                      n: int, c_idx: int = 0, bit_depth: int = 8
                      ) -> np.ndarray:
    """All 35 modes; applies per-mode reference smoothing."""
    ft, fl, fc = smooth_refs(top, left, corner)
    out = np.zeros((35, n, n), dtype=np.int32)
    for mode in range(35):
        if filter_flag(mode, n, c_idx):
            out[mode] = predict_mode(mode, ft, fl, fc, n, c_idx, bit_depth)
        else:
            out[mode] = predict_mode(mode, top, left, corner, n, c_idx,
                                     bit_depth)
    return out
