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


def neighbor_state_tree(inter16: np.ndarray, mv16: np.ndarray,
                        bx: int, by: int, cells: int, w16: int,
                        h16: int, zavail):
    """Scalar neighbor fetch for CUs inside a CTB32 quadtree: motion
    state lives on the 16-cell grid; candidate positions follow spec
    8.5.3.2.2 (A1/B1/B0/B2; A0 is never decoded in this layout) and
    availability is z-scan order (6.4.1, `zavail` predicate).

    Returns (a1, b1, b0, b2) as (mvx, mvy) tuples or None."""
    def get(nx, ny):
        if not zavail(bx, by, nx, ny, w16, h16):
            return None
        if not inter16[ny, nx]:
            return None
        return (int(mv16[ny, nx, 0]), int(mv16[ny, nx, 1]))
    a1 = get(bx - 1, by + cells - 1)
    b1 = get(bx + cells - 1, by - 1)
    b0 = get(bx + cells, by - 1)
    b2 = get(bx - 1, by - 1)
    return a1, b1, b0, b2


# ---------------------------------------------------------------------------
# Multi-reference P motion (round 5): neighbor state carries the L0
# ref_idx; merge candidates inherit (mv, ref); AMVP scales a
# different-ref neighbor MV by POC distances (spec 8.5.3.2.7/2.8).
# Reference behavior: search.cpp:2181 per-ref ME loop + getMvField.
# ---------------------------------------------------------------------------


def merge_candidates_ref_scalar(a1, b1, b0, b2,
                                max_merge: int = MAX_MERGE):
    """P multi-ref merge list: each neighbor is None or
    (mvx, mvy, ref).  Pairwise pruning compares full motion including
    the reference index (8.5.3.2.3); zero-fill appends (0, 0, ref 0)."""
    cands = []
    ca = tuple(a1) if a1 is not None else None
    cb1 = tuple(b1) if b1 is not None else None
    if ca is not None:
        cands.append(ca)
    if cb1 is not None and cb1 != ca:
        cands.append(cb1)
    if b0 is not None and tuple(b0) != cb1:
        cands.append(tuple(b0))
    if len(cands) < 4 and b2 is not None:
        cb2 = tuple(b2)
        if cb2 != ca and cb2 != cb1:
            cands.append(cb2)
    cands = cands[:max_merge]
    while len(cands) < max_merge:
        cands.append((0, 0, 0))
    return cands


def amvp_candidates_ref_scalar(a1, b0, b1, b2, cur_ref: int, poc: int,
                               ref_pocs):
    """AMVP for multi-ref P — same simplified candidate order as
    amvp_candidates_scalar (A = A1; B = first of B0/B1/B2; prune;
    zero-fill), with 8.5.3.2.8 POC-distance scaling when the neighbor
    references a different picture (8.5.3.2.7 scaled-candidate path)."""
    def mvp_of(n):
        mvx, mvy, r = n
        if r == cur_ref:
            return (mvx, mvy)
        dsf = dist_scale_factor(poc, ref_pocs[cur_ref], ref_pocs[r])
        return scale_mv((mvx, mvy), dsf)

    cands = []
    if a1 is not None:
        cands.append(mvp_of(a1))
    b = next((n for n in (b0, b1, b2) if n is not None), None)
    if b is not None:
        mb = mvp_of(b)
        if not cands or mb != cands[0]:
            cands.append(mb)
    while len(cands) < 2:
        cands.append((0, 0))
    return cands[:2]


def neighbor_state_tree_ref(inter16: np.ndarray, mv16: np.ndarray,
                            ref16: np.ndarray, bx: int, by: int,
                            cells: int, w16: int, h16: int, zavail):
    """Multi-ref variant of neighbor_state_tree: (mvx, mvy, ref)."""
    def get(nx, ny):
        if not zavail(bx, by, nx, ny, w16, h16):
            return None
        if not inter16[ny, nx]:
            return None
        return (int(mv16[ny, nx, 0]), int(mv16[ny, nx, 1]),
                int(ref16[ny, nx]))
    a1 = get(bx - 1, by + cells - 1)
    b1 = get(bx + cells - 1, by - 1)
    b0 = get(bx + cells, by - 1)
    b2 = get(bx - 1, by - 1)
    return a1, b1, b0, b2


def ref_idx_bins(idx: int, num_ref: int) -> int:
    """TR bin count of ref_idx_lX (9.3.3.2, cMax = num_ref - 1)."""
    if num_ref <= 1:
        return 0
    return idx + (1 if idx < num_ref - 1 else 0)


def neighbor_state_tree_b(dir16: np.ndarray, mv0_16: np.ndarray,
                          mv1_16: np.ndarray, bx: int, by: int,
                          cells: int, w16: int, h16: int, zavail):
    """B-slice variant: returns (a1, b1, b0, b2) as (dir, mv0, mv1)."""
    def get(nx, ny):
        if not zavail(bx, by, nx, ny, w16, h16):
            return None
        d = int(dir16[ny, nx])
        if d == 0:
            return None
        return (d, (int(mv0_16[ny, nx, 0]), int(mv0_16[ny, nx, 1])),
                (int(mv1_16[ny, nx, 0]), int(mv1_16[ny, nx, 1])))
    a1 = get(bx - 1, by + cells - 1)
    b1 = get(bx + cells - 1, by - 1)
    b0 = get(bx + cells, by - 1)
    b2 = get(bx - 1, by - 1)
    return a1, b1, b0, b2


# ---------------------------------------------------------------------------
# B-slice motion (two reference lists, one active ref per list)
#
# Neighbor motion is represented as None (unavailable/intra) or a tuple
# (dir, mv0, mv1): dir bit0 = uses L0, bit1 = uses L1; mv of an unused
# list is stored as (0, 0) so canonical comparison is a direct tuple
# compare (refIdx is always 0 per list).
# ---------------------------------------------------------------------------


def dist_scale_factor(poc_cur: int, poc_target_ref: int,
                      poc_other_ref: int) -> int:
    """Temporal MV scaling factor (spec 8.5.3.2.8): scales a motion
    vector pointing at poc_other_ref so it points at poc_target_ref."""
    tb = int(np.clip(poc_cur - poc_target_ref, -128, 127))
    td = int(np.clip(poc_cur - poc_other_ref, -128, 127))
    if td == 0:
        return 256           # identity (same picture)
    tx = ((16384 + (abs(td) >> 1)) // abs(td)) * (1 if td > 0 else -1)
    return int(np.clip((tb * tx + 32) >> 6, -4096, 4095))


def scale_mv(mv, dsf: int):
    """Apply a distance scale factor to one MV (spec 8.5.3.2.8)."""
    def one(v):
        x = dsf * int(v)
        return int(np.clip(
            (1 if x >= 0 else -1) * ((abs(x) + 127) >> 8), -32768, 32767))
    return (one(mv[0]), one(mv[1]))


def _canon_b(n):
    d, mv0, mv1 = n
    return (d,
            tuple(mv0) if (d & 1) else (0, 0),
            tuple(mv1) if (d & 2) else (0, 0))


def merge_candidates_b_scalar(a1, b1, b0, b2, max_merge: int = MAX_MERGE):
    """B-slice merge list (spec 8.5.3.2.3): spatial A1/B1/B0/B2 with
    pairwise pruning on full motion, zero-bi fill (8.5.3.2.5).  With
    MaxNumMergeCand == 2 the combined-bi stage (8.5.3.2.4) can never
    contribute (it requires >= 2 original candidates, which already
    fill the list), so it is omitted."""
    cands = []
    ca = _canon_b(a1) if a1 is not None else None
    cb1 = _canon_b(b1) if b1 is not None else None
    if ca is not None:
        cands.append(ca)
    if cb1 is not None and cb1 != ca:
        cands.append(cb1)
    if b0 is not None and _canon_b(b0) != cb1:
        cands.append(_canon_b(b0))
    if len(cands) < 4 and b2 is not None:
        cb2 = _canon_b(b2)
        if cb2 != ca and cb2 != cb1:
            cands.append(cb2)
    cands = cands[:max_merge]
    while len(cands) < max_merge:
        cands.append((3, (0, 0), (0, 0)))
    return cands


def amvp_candidates_b_scalar(a1, b1, b0, b2, list_x: int, dsf_cross: int):
    """AMVP list for list X in a B slice (spec 8.5.3.2.6/2.7, HM
    fillMvpCand order), single ref per list.

    A neighbor using list X always points at the target reference (same
    slice, one ref per list) -> taken as-is; a neighbor using only the
    other list contributes its MV scaled by dsf_cross (8.5.3.2.8).
    """
    def mvp_of(n):
        d, mv0, mv1 = n
        if d & (1 << list_x):
            return tuple(mv0 if list_x == 0 else mv1)
        return scale_mv(mv1 if list_x == 0 else mv0, dsf_cross)

    cands = []
    if a1 is not None:
        cands.append(mvp_of(a1))
    is_scaled = a1 is not None
    for n in (b0, b1, b2):          # B pass 1: same-list neighbors only
        if n is not None and (n[0] & (1 << list_x)):
            cands.append(tuple(n[1] if list_x == 0 else n[2]))
            break
    if not is_scaled:               # B scaled pass (only when A absent)
        for n in (b0, b1, b2):
            if n is not None:
                cands.append(mvp_of(n))
                break
    if len(cands) >= 2 and cands[0] == cands[1]:
        cands = cands[:1]
    cands = cands[:2]
    while len(cands) < 2:
        cands.append((0, 0))
    return cands


def neighbor_state_b(dir_map: np.ndarray, mv0_map: np.ndarray,
                     mv1_map: np.ndarray, cx: int, cy: int, wc: int):
    """Scalar neighbor fetch for the B decoder: (a1, b1, b0, b2)."""
    def get(x, y):
        if x < 0 or y < 0 or x >= wc:
            return None
        d = int(dir_map[y, x])
        if d == 0:
            return None
        return (d, (int(mv0_map[y, x, 0]), int(mv0_map[y, x, 1])),
                (int(mv1_map[y, x, 0]), int(mv1_map[y, x, 1])))
    return (get(cx - 1, cy), get(cx, cy - 1), get(cx + 1, cy - 1),
            get(cx - 1, cy - 1))


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
