"""Merge candidate list and AMVP derivation (ITU-T H.265 8.5.3.2.2-6).

Shared, pure derivations used by the encoder's wavefront decide pass
(vectorized, models/inter_frame.py) and the conformance decoder
(scalar, verify/decoder.py).  Role of reference `encoder/search.cpp`
mergeEstimation/selectMVP candidate construction (`search.cpp:1891,
1992`) re-derived from the spec.

Simplified, exactly valid for the v1 coding layout:
  - CU = CTU = 16x16, PART_2Nx2N -> neighbor positions A1/B1/B0/B2 map
    to whole neighbor CTUs; A0 (below-left) is never available in
    decode order.
  - single reference picture, no temporal MVP, no long-term refs ->
    no scaling paths.

Neighbor state per CTU: (is_inter, mv) where mv is in quarter-pel.
"""

from __future__ import annotations

import numpy as np

MAX_MERGE = 2   # five_minus_max_num_merge_cand = 3 in slice header


def merge_candidates_scalar(a1, b1, b0, b2):
    """Each arg: None (unavailable/intra) or (mvx, mvy) qpel tuple.

    Returns list of MAX_MERGE (mvx, mvy) tuples (zero-filled).
    Spec 8.5.3.2.3: availability + pairwise pruning, then zero fill
    (spec 8.5.3.2.5 zero merge candidates; P slice -> ref 0).
    """
    cands = []
    if a1 is not None:
        cands.append(tuple(a1))
    if b1 is not None and (a1 is None or tuple(b1) != tuple(a1)):
        cands.append(tuple(b1))
    if b0 is not None and (b1 is None or tuple(b0) != tuple(b1)):
        cands.append(tuple(b0))
    # A0 never available in the v1 layout.
    if len(cands) < 4 and b2 is not None:
        if (a1 is None or tuple(b2) != tuple(a1)) and \
           (b1 is None or tuple(b2) != tuple(b1)):
            cands.append(tuple(b2))
    cands = cands[:MAX_MERGE]
    while len(cands) < MAX_MERGE:
        cands.append((0, 0))
    return cands


def amvp_candidates_scalar(a1, b0, b1, b2):
    """AMVP list (spec 8.5.3.2.6), same-ref single-ref simplification.

    A = first available of (A0, A1) -> A1 only.
    B = first available of (B0, B1, B2).
    Prune B if equal to A; zero-fill to 2.
    """
    cands = []
    if a1 is not None:
        cands.append(tuple(a1))
    b = next((tuple(v) for v in (b0, b1, b2) if v is not None), None)
    if b is not None and (not cands or b != cands[0]):
        cands.append(b)
    while len(cands) < 2:
        cands.append((0, 0))
    return cands[:2]


def neighbor_state(pred_map: np.ndarray, mv_map: np.ndarray,
                   cx: int, cy: int, wc: int):
    """Scalar neighbor fetch for the decoder.

    pred_map: [hc, wc] (1 = inter), mv_map: [hc, wc, 2] qpel.
    Returns (a1, b1, b0, b2) as tuples or None.
    """
    def get(x, y):
        if x < 0 or y < 0 or x >= wc:
            return None
        if not pred_map[y, x]:
            return None
        return (int(mv_map[y, x, 0]), int(mv_map[y, x, 1]))
    a1 = get(cx - 1, cy)
    b1 = get(cx, cy - 1)
    b0 = get(cx + 1, cy - 1)
    b2 = get(cx - 1, cy - 1)
    return a1, b1, b0, b2


def mvd_bits(mvd_x: int, mvd_y: int) -> int:
    """Exact MVD bin count (for RD bit estimates)."""
    def one(v):
        a = abs(v)
        if a == 0:
            return 1
        if a == 1:
            return 3
        # greater0 + greater1 + EG1(a-2) + sign
        rem = a - 2
        k = 1
        length = 0
        while rem >= (1 << k):
            rem -= 1 << k
            k += 1
            length += 2
        return 2 + length + 1 + k + 1
    return one(mvd_x) + one(mvd_y)
