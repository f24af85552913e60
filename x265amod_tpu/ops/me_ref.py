"""Scalar/numpy oracles for motion compensation (decoder + kernel tests).

Spec 8.5.3.3.2 (clamped reference reads) and 8.5.3.3.3.2 (chroma 4-tap
interpolation at the two half phases reachable with integer luma MVs).
"""

from __future__ import annotations

import numpy as np

CHROMA_HALF = np.array([-4, 36, 36, -4], dtype=np.int64)


def mc_luma_int_np(ref: np.ndarray, x0: int, y0: int, mx: int, my: int,
                   n: int = 16) -> np.ndarray:
    h, w = ref.shape
    ys = np.clip(np.arange(y0 + my, y0 + my + n), 0, h - 1)
    xs = np.clip(np.arange(x0 + mx, x0 + mx + n), 0, w - 1)
    return ref[np.ix_(ys, xs)].astype(np.int32)


def mc_chroma_halfpel_np(ref: np.ndarray, x0: int, y0: int,
                         mv_luma_x: int, mv_luma_y: int, n: int = 8
                         ) -> np.ndarray:
    """Chroma MC for integer luma MV (frac in {0, 1/2} per axis)."""
    h, w = ref.shape
    cmx, cmy = mv_luma_x >> 1, mv_luma_y >> 1
    fx, fy = mv_luma_x & 1, mv_luma_y & 1
    # gather (n+3)x(n+3) window with clamp, origin at -1
    ys = np.clip(np.arange(y0 + cmy - 1, y0 + cmy + n + 2), 0, h - 1)
    xs = np.clip(np.arange(x0 + cmx - 1, x0 + cmx + n + 2), 0, w - 1)
    blk = ref[np.ix_(ys, xs)].astype(np.int64)
    t = CHROMA_HALF

    def hfilt(b):
        return sum(t[k] * b[:, k:k + n] for k in range(4))

    def vfilt(b):
        return sum(t[k] * b[k:k + n, :] for k in range(4))

    if fx == 0 and fy == 0:
        out = blk[1:1 + n, 1:1 + n]
    elif fx == 1 and fy == 0:
        out = (hfilt(blk)[1:1 + n, :] + 32) >> 6
    elif fx == 0 and fy == 1:
        out = (vfilt(blk)[:, 1:1 + n] + 32) >> 6
    else:
        out = ((vfilt(hfilt(blk)) >> 6) + 32) >> 6
    return np.clip(out, 0, 255).astype(np.int32)


LUMA_FILTERS = np.array([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1],
], dtype=np.int64)

CHROMA_FILTERS = np.array([
    [0, 64, 0, 0],
    [-2, 58, 10, -2],
    [-4, 54, 16, -2],
    [-6, 46, 28, -4],
    [-4, 36, 36, -4],
    [-4, 28, 46, -6],
    [-2, 16, 54, -4],
    [-2, 10, 58, -2],
], dtype=np.int64)


def mc_luma_qpel14_np(ref: np.ndarray, x0: int, y0: int, mv_qx: int,
                      mv_qy: int, n: int = 16) -> np.ndarray:
    """Quarter-pel luma MC oracle, 14-bit intermediate (spec
    8.5.3.3.3.1, 8-bit: stage1 shift 0, stage2 shift 6)."""
    h, w = ref.shape
    ix, iy = mv_qx >> 2, mv_qy >> 2
    fx, fy = mv_qx & 3, mv_qy & 3
    ys = np.clip(np.arange(y0 + iy - 3, y0 + iy + n + 4), 0, h - 1)
    xs = np.clip(np.arange(x0 + ix - 3, x0 + ix + n + 4), 0, w - 1)
    blk = ref[np.ix_(ys, xs)].astype(np.int64)   # [n+7, n+7]
    if fx == 0:
        hor = blk[:, 3:3 + n] << 6
    else:
        t = LUMA_FILTERS[fx]
        hor = sum(t[k] * blk[:, k:k + n] for k in range(8))
    if fy == 0:
        pred14 = hor[3:3 + n, :]
    else:
        t = LUMA_FILTERS[fy]
        pred14 = sum(t[k] * hor[k:k + n, :] for k in range(8)) >> 6
    return pred14


def mc_luma_qpel_np(ref: np.ndarray, x0: int, y0: int, mv_qx: int,
                    mv_qy: int, n: int = 16) -> np.ndarray:
    """Quarter-pel luma MC oracle, uni-pred rounded (8.5.3.3.4.2)."""
    pred14 = mc_luma_qpel14_np(ref, x0, y0, mv_qx, mv_qy, n)
    return np.clip((pred14 + 32) >> 6, 0, 255).astype(np.int32)


def mc_chroma_qpel14_np(ref: np.ndarray, x0: int, y0: int, mv_qx: int,
                        mv_qy: int, n: int = 8) -> np.ndarray:
    """Eighth-pel chroma MC oracle, 14-bit intermediate (8.5.3.3.3.2)."""
    h, w = ref.shape
    ix, iy = mv_qx >> 3, mv_qy >> 3
    fx, fy = mv_qx & 7, mv_qy & 7
    ys = np.clip(np.arange(y0 + iy - 1, y0 + iy + n + 2), 0, h - 1)
    xs = np.clip(np.arange(x0 + ix - 1, x0 + ix + n + 2), 0, w - 1)
    blk = ref[np.ix_(ys, xs)].astype(np.int64)   # [n+3, n+3]
    if fx == 0:
        hor = blk[:, 1:1 + n] << 6
    else:
        t = CHROMA_FILTERS[fx]
        hor = sum(t[k] * blk[:, k:k + n] for k in range(4))
    if fy == 0:
        pred14 = hor[1:1 + n, :]
    else:
        t = CHROMA_FILTERS[fy]
        pred14 = sum(t[k] * hor[k:k + n, :] for k in range(4)) >> 6
    return pred14


def mc_chroma_qpel_np(ref: np.ndarray, x0: int, y0: int, mv_qx: int,
                      mv_qy: int, n: int = 8) -> np.ndarray:
    """Eighth-pel chroma MC oracle, uni-pred rounded."""
    pred14 = mc_chroma_qpel14_np(ref, x0, y0, mv_qx, mv_qy, n)
    return np.clip((pred14 + 32) >> 6, 0, 255).astype(np.int32)


def bi_combine_np(pred14_a: np.ndarray, pred14_b: np.ndarray) -> np.ndarray:
    """Default bi-prediction combine (spec 8.5.3.3.4.3, 8-bit)."""
    return np.clip((pred14_a + pred14_b + 64) >> 7, 0, 255) \
        .astype(np.int32)
