"""Coefficient scan order tables (ITU-T H.265 6.5.3-6.5.4).

Role of reference scan tables in `common/constants.cpp` (g_scan*), built
programmatically.  Scans are stored as arrays of (x, y) positions in
*scan* order (DC first); residual coding processes them in reverse.
"""

from __future__ import annotations

import functools

import numpy as np

SCAN_DIAG = 0
SCAN_HOR = 1
SCAN_VER = 2


@functools.lru_cache(maxsize=None)
def diag_scan(size: int) -> np.ndarray:
    """Up-right diagonal scan (spec 6.5.3): [(x,y), ...] DC first."""
    out = []
    x = y = 0
    while len(out) < size * size:
        while y >= 0:
            if x < size and y < size:
                out.append((x, y))
            y -= 1
            x += 1
        y = x
        x = 0
    return np.array(out, dtype=np.int32)


@functools.lru_cache(maxsize=None)
def hor_scan(size: int) -> np.ndarray:
    return np.array([(x, y) for y in range(size) for x in range(size)],
                    dtype=np.int32)


@functools.lru_cache(maxsize=None)
def ver_scan(size: int) -> np.ndarray:
    return np.array([(x, y) for x in range(size) for y in range(size)],
                    dtype=np.int32)


def scan_order(scan_idx: int, size: int) -> np.ndarray:
    return (diag_scan, hor_scan, ver_scan)[scan_idx](size)


@functools.lru_cache(maxsize=None)
def full_scan(scan_idx: int, log2_size: int) -> np.ndarray:
    """Full-TU scan: subblock scan x within-subblock scan.

    Returns [(x, y), ...] over the whole NxN TU in scan order: coefficients
    of subblock 0 (DC subblock) first.  Per spec 7.4.9.11 the subblock
    scan uses the same scan_idx as the coefficient scan.
    """
    n = 1 << log2_size
    if log2_size == 2:
        return scan_order(scan_idx, 4)
    sb = scan_order(scan_idx, n >> 2)
    inner = scan_order(scan_idx, 4)
    out = []
    for sx, sy in sb:
        for cx, cy in inner:
            out.append((sx * 4 + cx, sy * 4 + cy))
    return np.array(out, dtype=np.int32)


def intra_scan_idx(pred_mode: int, log2_size: int, c_idx: int) -> int:
    """Mode-dependent coefficient scan (spec 7.4.9.11).

    Applies for 4x4 TUs and luma 8x8 TUs in intra CUs.
    """
    if log2_size == 2 or (log2_size == 3 and c_idx == 0):
        if 6 <= pred_mode <= 14:
            return SCAN_VER
        if 22 <= pred_mode <= 30:
            return SCAN_HOR
    return SCAN_DIAG


# sig_coeff_flag 4x4 context map (spec 9.3.4.2.5: ctxIdxMap)
CTX_IDX_MAP_4x4 = np.array([0, 1, 4, 5, 2, 3, 4, 5, 6, 6, 8, 8, 7, 7, 8, 8],
                           dtype=np.int32)
