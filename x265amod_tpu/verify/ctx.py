"""Independently re-derived context-index derivations for the decoder.

VERDICT rounds 3-4 flagged a common-mode risk: the conformance decoder
imported the same ctx-derivation helpers the encoder serializes with
(cabac/syntax.py), so a shared spec misreading would pass the
encode->decode roundtrip silently.  This module re-derives the
derivations straight from ITU-T H.265 (2021) clause text in a
DIFFERENT form (table-driven where syntax.py is formula-driven), and
tests/test_ctx_differential.py compares the two implementations
exhaustively — turning the common mode into an explicit differential
oracle.
"""

from __future__ import annotations

# Table 9-45: ctxIdxMap for 4x4 sig_coeff_flag (copied from the spec
# table, not from cabac/scans.py)
_CTX_IDX_MAP_4x4 = (0, 1, 4, 5, 2, 3, 4, 5, 6, 6, 8, 8, 7, 7, 8, 8)

# 9.3.4.2.5: sigCtx per position-in-CG for each prevCsbf state,
# prevCsbf = csbf_right + 2 * csbf_below; entry [prev][4*yP + xP]
_SIG_PATTERNS = tuple(tuple(row) for row in (
    # prev 0: 2 at DC corner, 1 while xP+yP < 3, else 0
    (2, 1, 1, 0,
     1, 1, 0, 0,
     1, 0, 0, 0,
     0, 0, 0, 0),
    # prev 1 (right CG coded): rows 0/1/2+ -> 2/1/0
    (2, 2, 2, 2,
     1, 1, 1, 1,
     0, 0, 0, 0,
     0, 0, 0, 0),
    # prev 2 (below CG coded): cols 0/1/2+ -> 2/1/0
    (2, 1, 0, 0,
     2, 1, 0, 0,
     2, 1, 0, 0,
     2, 1, 0, 0),
    # prev 3: always 2
    (2, 2, 2, 2,
     2, 2, 2, 2,
     2, 2, 2, 2,
     2, 2, 2, 2),
))


def sig_ctx_inc_dec(xc: int, yc: int, log2_size: int, c_idx: int,
                    scan_idx: int, csbf_right: int,
                    csbf_below: int) -> int:
    """sig_coeff_flag ctxInc (9.3.4.2.5), chroma ctx base 27."""
    base = 27 if c_idx else 0
    if log2_size == 2:
        return base + _CTX_IDX_MAP_4x4[4 * yc + xc]
    if xc == 0 and yc == 0:
        return base                     # sigCtx = 0 for DC
    pat = _SIG_PATTERNS[csbf_right + 2 * csbf_below]
    sig = pat[4 * (yc % 4) + (xc % 4)]
    if c_idx == 0:
        if xc >= 4 or yc >= 4:          # outside the DC CG
            sig += 3
        if log2_size == 3:
            sig += 9 if scan_idx == 0 else 15
        else:
            sig += 21
    else:
        sig += 9 if log2_size == 3 else 12
    return base + sig


# 9.3.4.2.3: (ctxOffset, ctxShift) for last_sig_coeff prefix bins,
# luma tabulated per log2TrafoSize
_LAST_LUMA = {2: (0, 0), 3: (3, 1), 4: (6, 1), 5: (10, 1)}


def last_ctx_params_dec(log2_size: int, c_idx: int) -> tuple[int, int]:
    if c_idx == 0:
        return _LAST_LUMA[log2_size]
    return 15, log2_size - 2


# Table 9-48: groupIdx -> minInGroup
_MIN_IN_GROUP = (0, 1, 2, 3, 4, 6, 8, 12, 16, 24)


def last_prefix_min_dec(group: int) -> int:
    return _MIN_IN_GROUP[group]


def mpm_list_dec(cand_a: int, cand_b: int) -> list[int]:
    """candModeList (8.4.2), re-derived: the +-1 angular neighbors are
    written with the spec's explicit -2-1 / -2+1 mod-32 wrap."""
    if cand_a == cand_b:
        if cand_a < 2:                  # Planar or DC neighbors
            return [0, 1, 26]
        lo = 2 + ((cand_a - 2 - 1) % 32)
        hi = 2 + ((cand_a - 2 + 1) % 32)
        return [cand_a, lo, hi]
    out = [cand_a, cand_b]
    for fill in (0, 1, 26):
        if fill not in out:
            out.append(fill)
            break
    return out
