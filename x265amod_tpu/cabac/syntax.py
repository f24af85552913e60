"""CTU syntax coding: coding unit, transform tree, residual coding.

Role of reference `encoder/entropy.cpp:768-1900` (encodeCTU/codeCoeffNxN)
re-derived from ITU-T H.265 7.3.8 + 9.3.3/9.3.4.  Context index
derivations live in pure helper functions shared by the encoder (here)
and the conformance decoder (verify/decoder.py), so any asymmetry shows
up as a roundtrip failure rather than silent drift.

v1 pipeline scope: I slices, CTU = CU = 16x16 (part 2Nx2N), TU 16 luma +
TU 8 chroma, diagonal scans, no SDH/TSkip/RDOQ-specific syntax.  The
generic residual_coding below already handles 4..32 TUs and all scans
for the wider pipeline.
"""

from __future__ import annotations

import numpy as np

from .engine import CabacEncoder
from .scans import CTX_IDX_MAP_4x4, SCAN_VER, full_scan, scan_order
from .tables import CTX_OFFSET

# ---- context group bases ---------------------------------------------------
CTX_SPLIT_CU = CTX_OFFSET["split_cu_flag"]
CTX_PART_MODE = CTX_OFFSET["part_mode"]
CTX_PREV_INTRA = CTX_OFFSET["prev_intra_luma_pred_flag"]
CTX_CHROMA_PRED = CTX_OFFSET["intra_chroma_pred_mode"]
CTX_QT_CBF_LUMA = CTX_OFFSET["qt_cbf"]          # +0/1 by trafoDepth!=0
CTX_QT_CBF_CHROMA = CTX_OFFSET["qt_cbf"] + 2    # +trafoDepth
CTX_SPLIT_TRANSFORM = CTX_OFFSET["split_transform_flag"]
CTX_LAST_X = CTX_OFFSET["last_sig_coeff_prefix"]
CTX_LAST_Y = CTX_OFFSET["last_sig_coeff_prefix"] + 18
CTX_CSBF = CTX_OFFSET["coded_sub_block_flag"]
CTX_SIG = CTX_OFFSET["sig_coeff_flag"]
CTX_GT1 = CTX_OFFSET["coeff_abs_level_greater1_flag"]
CTX_GT2 = CTX_OFFSET["coeff_abs_level_greater2_flag"]
CTX_SAO_MERGE = CTX_OFFSET["sao_merge_flag"]
CTX_SAO_TYPE = CTX_OFFSET["sao_type_idx"]
CTX_CU_SKIP = CTX_OFFSET["cu_skip_flag"]
CTX_PRED_MODE = CTX_OFFSET["pred_mode_flag"]
CTX_MERGE_FLAG = CTX_OFFSET["merge_flag"]
CTX_MERGE_IDX = CTX_OFFSET["merge_idx"]
CTX_RQT_ROOT_CBF = CTX_OFFSET["rqt_root_cbf"]
CTX_MVD = CTX_OFFSET["abs_mvd_greater_flag"]
CTX_MVP = CTX_OFFSET["mvp_flag"]
CTX_REF_IDX = CTX_OFFSET["ref_idx"]
CTX_INTER_DIR = CTX_OFFSET["inter_pred_idc"]
CTX_CU_QP_DELTA = CTX_OFFSET["cu_qp_delta_abs"]
CTX_TQ_BYPASS = CTX_OFFSET["cu_transquant_bypass_flag"]


def encode_cu_qp_delta(enc: CabacEncoder, delta: int) -> None:
    """cu_qp_delta_abs/sign (spec 7.3.8.10, binarization 9.3.3.10:
    TU(5) prefix with ctx0 / ctx1, EG0 bypass suffix, bypass sign)."""
    a = abs(delta)
    prefix = min(a, 5)
    for k in range(prefix):
        enc.encode_bin(CTX_CU_QP_DELTA + (0 if k == 0 else 1), 1)
    if prefix < 5:
        enc.encode_bin(CTX_CU_QP_DELTA + (0 if prefix == 0 else 1), 0)
    if a >= 5:
        _write_ep_exgolomb(enc, a - 5, 0)
    if a:
        enc.encode_bypass(1 if delta < 0 else 0)


def decode_cu_qp_delta(d) -> int:
    """Decoder twin of encode_cu_qp_delta."""
    a = 0
    while a < 5 and d.decode_bin(CTX_CU_QP_DELTA + (0 if a == 0 else 1)):
        a += 1
    if a == 5:
        k = 0
        while d.decode_bypass():
            k += 1
        rem = (1 << k) - 1 + (d.decode_bypass_bins(k) if k else 0)
        a += rem
    if a == 0:
        return 0
    sign = d.decode_bypass()
    return -a if sign else a


# ---- shared derivations ----------------------------------------------------

def mpm_list(cand_a: int, cand_b: int) -> list[int]:
    """candModeList derivation (spec 8.4.2).  cand_a/b already defaulted
    to DC (1) when the neighbor is unavailable/non-intra/above-CTU."""
    if cand_a == cand_b:
        if cand_a < 2:
            return [0, 1, 26]
        return [cand_a, 2 + ((cand_a + 29) % 32), 2 + ((cand_a - 2 + 1) % 32)]
    lst = [cand_a, cand_b]
    if 0 not in lst:
        lst.append(0)
    elif 1 not in lst:
        lst.append(1)
    else:
        lst.append(26)
    return lst


def last_prefix_group(pos: int) -> int:
    """groupIdx: last position -> prefix value (spec Table 9-48 area)."""
    if pos < 4:
        return pos
    k = pos.bit_length() - 1
    return 2 * k + ((pos >> (k - 1)) & 1)


def last_prefix_min(group: int) -> int:
    """minInGroup: prefix value -> smallest position."""
    if group < 4:
        return group
    return (2 + (group & 1)) << ((group >> 1) - 1)


def last_ctx_params(log2_size: int, c_idx: int) -> tuple[int, int]:
    """(ctxOffset, ctxShift) for last_sig_coeff prefix (9.3.4.2.3)."""
    if c_idx == 0:
        return 3 * (log2_size - 2) + ((log2_size - 1) >> 2), \
            (log2_size + 1) >> 2
    return 15, log2_size - 2


def sig_ctx_inc(xc: int, yc: int, log2_size: int, c_idx: int,
                scan_idx: int, csbf_right: int, csbf_below: int) -> int:
    """sig_coeff_flag ctxInc (spec 9.3.4.2.5), incl. chroma offset 27."""
    if log2_size == 2:
        sig = int(CTX_IDX_MAP_4x4[(yc << 2) + xc])
    elif xc + yc == 0:
        sig = 0
    else:
        prev = csbf_right + 2 * csbf_below
        xp, yp = xc & 3, yc & 3
        if prev == 0:
            sig = 2 if xp + yp == 0 else (1 if xp + yp < 3 else 0)
        elif prev == 1:
            sig = 2 if yp == 0 else (1 if yp == 1 else 0)
        elif prev == 2:
            sig = 2 if xp == 0 else (1 if xp == 1 else 0)
        else:
            sig = 2
        if c_idx == 0:
            if (xc >> 2) + (yc >> 2) > 0:
                sig += 3
            sig += (9 if scan_idx == 0 else 15) if log2_size == 3 else 21
        else:
            sig += 9 if log2_size == 3 else 12
    return sig + (27 if c_idx else 0)


# ---- residual coding (encode side) ----------------------------------------

def residual_coding(enc: CabacEncoder, levels: np.ndarray, log2_size: int,
                    c_idx: int, scan_idx: int = 0,
                    sign_hide: bool = False) -> None:
    """Encode one TU's coefficients (spec 7.3.8.11).

    levels: [y][x] int array of quantized coefficients (at least one
    nonzero — caller handles the cbf).
    """
    n = 1 << log2_size
    scan = full_scan(scan_idx, log2_size)          # [(x, y)] DC-first
    lv = levels
    nz_scan = [i for i, (x, y) in enumerate(scan) if lv[y, x] != 0]
    assert nz_scan, "residual_coding called on all-zero block"
    last_pos = nz_scan[-1]
    xl, yl = int(scan[last_pos][0]), int(scan[last_pos][1])

    # last_sig_coeff_{x,y}
    cx, cy = (yl, xl) if scan_idx == SCAN_VER else (xl, yl)
    off, shift = last_ctx_params(log2_size, c_idx)
    cmax = (log2_size << 1) - 1
    for coord, base in ((cx, CTX_LAST_X), (cy, CTX_LAST_Y)):
        g = last_prefix_group(coord)
        for b in range(min(g, cmax)):
            enc.encode_bin(base + off + (b >> shift), 1)
        if g < cmax:
            enc.encode_bin(base + off + (g >> shift), 0)
    for coord in (cx, cy):
        g = last_prefix_group(coord)
        if g > 3:
            nbits = (g >> 1) - 1
            enc.encode_bypass_bins(coord - last_prefix_min(g), nbits)

    # subblock structure
    n_sb = n >> 2
    sb_scan = scan_order(scan_idx, n_sb) if n_sb > 1 else \
        np.array([[0, 0]], dtype=np.int32)
    inner = scan_order(scan_idx, 4)
    csbf = np.zeros((n_sb, n_sb), dtype=np.int32)
    for sx in range(n_sb):
        for sy in range(n_sb):
            if lv[sy * 4:sy * 4 + 4, sx * 4:sx * 4 + 4].any():
                csbf[sy, sx] = 1
    last_sb = last_pos >> 4
    c1 = 1
    for i in range(last_sb, -1, -1):
        sbx, sby = int(sb_scan[i][0]), int(sb_scan[i][1])
        infer_sb_dc = False
        if i == last_sb or i == 0:
            sb_coded = 1
        else:
            sb_coded = int(csbf[sby, sbx])
            right = int(csbf[sby, sbx + 1]) if sbx + 1 < n_sb else 0
            below = int(csbf[sby + 1, sbx]) if sby + 1 < n_sb else 0
            ctx = min(right + below, 1) + (2 if c_idx else 0)
            enc.encode_bin(CTX_CSBF + ctx, sb_coded)
            infer_sb_dc = bool(sb_coded)
        if not sb_coded:
            continue
        right = int(csbf[sby, sbx + 1]) if sbx + 1 < n_sb else 0
        below = int(csbf[sby + 1, sbx]) if sby + 1 < n_sb else 0

        # significance flags, reverse scan within subblock
        start = 15 if i < last_sb else (last_pos & 15) - 1
        sig_pos = []           # scan positions (in-subblock 0..15) with sig=1
        if i == last_sb:
            sig_pos.append(last_pos & 15)
        coded_any = bool(sig_pos)
        for np_ in range(start, -1, -1):
            xc = sbx * 4 + int(inner[np_][0])
            yc = sby * 4 + int(inner[np_][1])
            sig = int(lv[yc, xc] != 0)
            if np_ == 0 and infer_sb_dc and not coded_any:
                assert sig == 1, "csbf=1 but empty subblock"
            else:
                ctx = sig_ctx_inc(xc, yc, log2_size, c_idx, scan_idx,
                                  right, below)
                enc.encode_bin(CTX_SIG + ctx, sig)
            if sig:
                sig_pos.append(np_)
                coded_any = True

        # greater1 / greater2 / signs / remaining (reverse scan order)
        abs_coeffs = []
        signs = []
        for np_ in sig_pos:
            xc = sbx * 4 + int(inner[np_][0])
            yc = sby * 4 + int(inner[np_][1])
            v = int(lv[yc, xc])
            abs_coeffs.append(abs(v))
            signs.append(1 if v < 0 else 0)
        num_sig = len(abs_coeffs)
        ctx_set = 2 if (i > 0 and c_idx == 0) else 0
        if c1 == 0:
            ctx_set += 1
        c1 = 1
        num_c1 = min(num_sig, 8)
        gt1_flags = []
        for idx in range(num_c1):
            gt1 = int(abs_coeffs[idx] > 1)
            ctx = (ctx_set * 4 + min(c1, 3)) + (16 if c_idx else 0)
            enc.encode_bin(CTX_GT1 + ctx, gt1)
            gt1_flags.append(gt1)
            if gt1:
                c1 = 0
            elif 0 < c1 < 3:
                c1 += 1
        first_gt1 = next((k for k, f in enumerate(gt1_flags) if f), -1)
        if first_gt1 >= 0:
            gt2 = int(abs_coeffs[first_gt1] > 2)
            enc.encode_bin(CTX_GT2 + ctx_set + (4 if c_idx else 0), gt2)
        # signs; under sign data hiding the first significant
        # coefficient's sign is inferred from the level-sum parity
        # (spec 7.4.9.11 signHidden) — the quantizer forced it
        # (ops/sbh.py), asserted here
        sign_hidden = sign_hide and num_sig > 1 and \
            (sig_pos[0] - sig_pos[-1] > 3)
        if sign_hidden:
            assert (sum(abs_coeffs) & 1) == signs[-1], \
                "sign-bit hiding parity not forced by the quantizer"
        for s in (signs[:-1] if sign_hidden else signs):
            enc.encode_bypass(s)
        # remaining levels
        rice = 0
        first2 = 1
        for idx in range(num_sig):
            base_level = (2 + first2) if idx < 8 else 1
            if idx == first_gt1:
                pass  # base includes gt2 slot via first2
            v = abs_coeffs[idx]
            if v >= base_level:
                _write_remaining(enc, v - base_level, rice)
                if v > (3 << rice):
                    rice = min(rice + 1, 4)
            if v >= 2:
                first2 = 0


def _write_remaining(enc: CabacEncoder, value: int, rice: int) -> None:
    """coeff_abs_level_remaining binarization (spec 9.3.3.13)."""
    prefix = value >> rice
    if prefix < 3:
        for _ in range(prefix):
            enc.encode_bypass(1)
        enc.encode_bypass(0)
        enc.encode_bypass_bins(value & ((1 << rice) - 1), rice)
    else:
        q = prefix - 3
        length = (q + 1).bit_length() - 1
        rem = q - ((1 << length) - 1)
        for _ in range(3 + length):
            enc.encode_bypass(1)
        enc.encode_bypass(0)
        enc.encode_bypass_bins((rem << rice) + (value & ((1 << rice) - 1)),
                               length + rice)


# ---- CU-quadtree syntax (CTU32, depth-1 tree) -------------------------------

def encode_split_cu(enc: CabacEncoder, split: int, depth_left: int,
                    depth_above: int, avail_l: bool,
                    avail_a: bool) -> None:
    """split_cu_flag (spec 7.3.8.4; ctxInc 9.3.4.2.2: one increment per
    available neighbor whose CtDepth exceeds the current depth —
    evaluated here at cqtDepth == 0)."""
    ctx = (1 if (avail_l and depth_left > 0) else 0) + \
        (1 if (avail_a and depth_above > 0) else 0)
    enc.encode_bin(CTX_SPLIT_CU + ctx, split)


def decode_split_cu(d, depth_left: int, depth_above: int, avail_l: bool,
                    avail_a: bool) -> int:
    ctx = (1 if (avail_l and depth_left > 0) else 0) + \
        (1 if (avail_a and depth_above > 0) else 0)
    return d.decode_bin(CTX_SPLIT_CU + ctx)


def _encode_intra_luma_mode(enc: CabacEncoder, mode: int,
                            mpms: list[int]) -> None:
    """prev_intra_luma_pred_flag + mpm_idx / rem_intra_luma_pred_mode."""
    if mode in mpms:
        enc.encode_bin(CTX_PREV_INTRA, 1)
        idx = mpms.index(mode)
        enc.encode_bypass(1 if idx else 0)
        if idx:
            enc.encode_bypass(idx - 1)
    else:
        enc.encode_bin(CTX_PREV_INTRA, 0)
        rem = mode
        for m in sorted(mpms, reverse=True):
            if rem > m:
                rem -= 1
        enc.encode_bypass_bins(rem, 5)


def encode_intra_cu(enc: CabacEncoder, log2_size: int, luma_mode: int,
                    luma_levels: np.ndarray, cb_levels: np.ndarray,
                    cr_levels: np.ndarray, cand_a: int, cand_b: int,
                    qp_delta: int | None = None,
                    min_cb_log2: int = 4,
                    tq_bypass: int | None = None,
                    sign_hide: bool = False) -> None:
    """One intra CU of size 16 or 32 inside a quadtree (split flag coded
    by the caller): part_mode (only at min CB size), luma mode (MPM),
    DM chroma, transform tree with TU == CU luma + half-size chroma.
    Spec 7.3.8.5; reference behavior: entropy.cpp encodeCU."""
    if tq_bypass is not None:
        enc.encode_bin(CTX_TQ_BYPASS, tq_bypass)
    if log2_size == min_cb_log2:
        enc.encode_bin(CTX_PART_MODE, 1)    # PART_2Nx2N
    _encode_intra_luma_mode(enc, luma_mode, mpm_list(cand_a, cand_b))
    enc.encode_bin(CTX_CHROMA_PRED, 0)      # DM chroma
    cbf_cb = int(cb_levels.any())
    cbf_cr = int(cr_levels.any())
    cbf_y = int(luma_levels.any())
    enc.encode_bin(CTX_QT_CBF_CHROMA + 0, cbf_cb)
    enc.encode_bin(CTX_QT_CBF_CHROMA + 0, cbf_cr)
    enc.encode_bin(CTX_QT_CBF_LUMA + 1, cbf_y)   # trafoDepth==0 -> ctx 1
    if qp_delta is not None and (cbf_y or cbf_cb or cbf_cr):
        encode_cu_qp_delta(enc, qp_delta)
    if cbf_y:
        residual_coding(enc, luma_levels, log2_size, 0, 0,
                        sign_hide=sign_hide)
    if cbf_cb:
        residual_coding(enc, cb_levels, log2_size - 1, 1, 0,
                        sign_hide=sign_hide)
    if cbf_cr:
        residual_coding(enc, cr_levels, log2_size - 1, 2, 0,
                        sign_hide=sign_hide)


def assemble_tu32(cells: np.ndarray, by: int, bx: int,
                  n: int = 16) -> np.ndarray:
    """Assemble a 2n x 2n coefficient (or level) array from the four
    quadrant cells at [by..by+1, bx..bx+1] of a 16-grid array."""
    top = np.concatenate([cells[by, bx], cells[by, bx + 1]], axis=1)
    bot = np.concatenate([cells[by + 1, bx], cells[by + 1, bx + 1]],
                         axis=1)
    return np.concatenate([top, bot], axis=0)


# ---- CU-level syntax (v1: 16x16 intra CU) ----------------------------------

def encode_intra_ctu16(enc: CabacEncoder, luma_mode: int,
                       luma_levels: np.ndarray, cb_levels: np.ndarray,
                       cr_levels: np.ndarray, cand_a: int,
                       cand_b: int = 1,
                       qp_delta: int | None = None,
                       tq_bypass: int | None = None,
                       sign_hide: bool = False) -> None:
    """Encode one 16x16 I-slice CTU: CU (2Nx2N intra) + TU16 luma/TU8
    chroma residuals.  cand_a = left CU luma mode (DC if unavailable),
    cand_b = above (always DC at CTU boundary with 16px CTUs).
    qp_delta: cu_qp_delta to signal when coefficients are coded (None
    when pps cu_qp_delta_enabled is off).
    tq_bypass: None when pps transquant_bypass disabled; else 0/1
    (cu_transquant_bypass_flag, spec 7.3.8.5 first CU syntax element).
    """
    if tq_bypass is not None:
        enc.encode_bin(CTX_TQ_BYPASS, tq_bypass)
    # split_cu_flag not present (log2CbSize == MinCbLog2SizeY)
    # part_mode: 1 => PART_2Nx2N (signaled because log2CbSize == MinCb)
    enc.encode_bin(CTX_PART_MODE, 1)
    mpms = mpm_list(cand_a, cand_b)
    if luma_mode in mpms:
        enc.encode_bin(CTX_PREV_INTRA, 1)
        idx = mpms.index(luma_mode)
        enc.encode_bypass(1 if idx else 0)
        if idx:
            enc.encode_bypass(idx - 1)
    else:
        enc.encode_bin(CTX_PREV_INTRA, 0)
        rem = luma_mode
        for m in sorted(mpms, reverse=True):
            if rem > m:
                rem -= 1
        enc.encode_bypass_bins(rem, 5)
    # intra_chroma_pred_mode: derived (DM) mode only in v1
    enc.encode_bin(CTX_CHROMA_PRED, 0)
    # transform_tree: no split flag (MaxTrafoDepth==0, TU==CU)
    cbf_cb = int(cb_levels.any())
    cbf_cr = int(cr_levels.any())
    cbf_y = int(luma_levels.any())
    enc.encode_bin(CTX_QT_CBF_CHROMA + 0, cbf_cb)
    enc.encode_bin(CTX_QT_CBF_CHROMA + 0, cbf_cr)
    enc.encode_bin(CTX_QT_CBF_LUMA + 1, cbf_y)   # trafoDepth==0 -> ctx 1
    if qp_delta is not None and (cbf_y or cbf_cb or cbf_cr):
        encode_cu_qp_delta(enc, qp_delta)
    if cbf_y:
        residual_coding(enc, luma_levels, 4, 0, 0,
                        sign_hide=sign_hide)
    if cbf_cb:
        residual_coding(enc, cb_levels, 3, 1, 0,
                        sign_hide=sign_hide)
    if cbf_cr:
        residual_coding(enc, cr_levels, 3, 2, 0,
                        sign_hide=sign_hide)

# ---- P-slice CTU syntax (v1: CU16 2Nx2N, skip / AMVP-inter / intra) --------

def _write_ep_exgolomb(enc: CabacEncoder, value: int, k: int) -> None:
    """k-th order exp-Golomb, bypass bins (reference writeEpExGolomb)."""
    while value >= (1 << k):
        enc.encode_bypass(1)
        value -= 1 << k
        k += 1
    enc.encode_bypass(0)
    enc.encode_bypass_bins(value, k)


def encode_mvd(enc: CabacEncoder, mvd_x: int, mvd_y: int) -> None:
    """MVD coding (spec 7.3.8.9 mvd_coding)."""
    ax, ay = abs(mvd_x), abs(mvd_y)
    enc.encode_bin(CTX_MVD, 1 if ax else 0)
    enc.encode_bin(CTX_MVD, 1 if ay else 0)
    if ax:
        enc.encode_bin(CTX_MVD + 1, 1 if ax > 1 else 0)
    if ay:
        enc.encode_bin(CTX_MVD + 1, 1 if ay > 1 else 0)
    if ax:
        if ax > 1:
            _write_ep_exgolomb(enc, ax - 2, 1)
        enc.encode_bypass(1 if mvd_x < 0 else 0)
    if ay:
        if ay > 1:
            _write_ep_exgolomb(enc, ay - 2, 1)
        enc.encode_bypass(1 if mvd_y < 0 else 0)


def encode_merge_idx(enc: CabacEncoder, idx: int, max_merge: int) -> None:
    if max_merge <= 1:
        return
    enc.encode_bin(CTX_MERGE_IDX, 1 if idx > 0 else 0)
    for k in range(1, idx):
        enc.encode_bypass(1)
    if 0 < idx < max_merge - 1:
        enc.encode_bypass(0)


def encode_ref_idx(enc: CabacEncoder, idx: int, num_ref: int) -> None:
    """ref_idx_lX (spec 7.3.8.6 / 9.3.3.2): truncated-Rice TR with
    cMax = num_ref - 1; bins 0 and 1 context-coded (ref_idx[0..1]),
    the rest bypass (Table 9-44).  Omitted when one ref is active."""
    if num_ref <= 1:
        return
    cmax = num_ref - 1
    for k in range(idx):
        if k < 2:
            enc.encode_bin(CTX_REF_IDX + k, 1)
        else:
            enc.encode_bypass(1)
    if idx < cmax:
        if idx < 2:
            enc.encode_bin(CTX_REF_IDX + idx, 0)
        else:
            enc.encode_bypass(0)


def encode_inter_ctu16(enc: CabacEncoder, ctu: dict,
                       left_skip: int, above_skip: int,
                       cand_a_intra_mode: int, max_merge: int = 2,
                       qp_delta: int | None = None,
                       sign_hide: bool = False) -> None:
    """Encode one P-slice CTU.

    ctu dict keys: kind ('skip'|'inter'|'intra'); merge_idx; mvd (x,y);
    mvp_idx; luma_mode; levels_y/cb/cr (zeros arrays when absent).
    """
    skip = 1 if ctu["kind"] == "skip" else 0
    enc.encode_bin(CTX_CU_SKIP + left_skip + above_skip, skip)
    if skip:
        encode_merge_idx(enc, ctu["merge_idx"], max_merge)
        return
    intra = ctu["kind"] == "intra"
    enc.encode_bin(CTX_PRED_MODE, 1 if intra else 0)
    enc.encode_bin(CTX_PART_MODE, 1)   # PART_2Nx2N
    if intra:
        mpms = mpm_list(cand_a_intra_mode, 1)
        mode = ctu["luma_mode"]
        if mode in mpms:
            enc.encode_bin(CTX_PREV_INTRA, 1)
            idx = mpms.index(mode)
            enc.encode_bypass(1 if idx else 0)
            if idx:
                enc.encode_bypass(idx - 1)
        else:
            enc.encode_bin(CTX_PREV_INTRA, 0)
            rem = mode
            for m in sorted(mpms, reverse=True):
                if rem > m:
                    rem -= 1
            enc.encode_bypass_bins(rem, 5)
        enc.encode_bin(CTX_CHROMA_PRED, 0)    # DM
        cbf_cb = int(ctu["levels_cb"].any())
        cbf_cr = int(ctu["levels_cr"].any())
        cbf_y = int(ctu["levels_y"].any())
        enc.encode_bin(CTX_QT_CBF_CHROMA, cbf_cb)
        enc.encode_bin(CTX_QT_CBF_CHROMA, cbf_cr)
        enc.encode_bin(CTX_QT_CBF_LUMA + 1, cbf_y)
        if qp_delta is not None and (cbf_y or cbf_cb or cbf_cr):
            encode_cu_qp_delta(enc, qp_delta)
        if cbf_y:
            residual_coding(enc, ctu["levels_y"], 4, 0, 0,
                            sign_hide=sign_hide)
        if cbf_cb:
            residual_coding(enc, ctu["levels_cb"], 3, 1, 0,
                            sign_hide=sign_hide)
        if cbf_cr:
            residual_coding(enc, ctu["levels_cr"], 3, 2, 0,
                            sign_hide=sign_hide)
        return
    # AMVP inter (merge_flag = 0)
    enc.encode_bin(CTX_MERGE_FLAG, 0)
    # P slice, 1 active ref: no inter_pred_idc / ref_idx bins
    encode_mvd(enc, ctu["mvd"][0], ctu["mvd"][1])
    enc.encode_bin(CTX_MVP, ctu["mvp_idx"])
    _encode_residual_root(enc, ctu, qp_delta, sign_hide)


def _encode_intra_in_inter(enc: CabacEncoder, ctu: dict,
                           cand_a_intra_mode: int,
                           qp_delta: int | None = None,
                           sign_hide: bool = False) -> None:
    mpms = mpm_list(cand_a_intra_mode, 1)
    mode = ctu["luma_mode"]
    if mode in mpms:
        enc.encode_bin(CTX_PREV_INTRA, 1)
        idx = mpms.index(mode)
        enc.encode_bypass(1 if idx else 0)
        if idx:
            enc.encode_bypass(idx - 1)
    else:
        enc.encode_bin(CTX_PREV_INTRA, 0)
        rem = mode
        for m in sorted(mpms, reverse=True):
            if rem > m:
                rem -= 1
        enc.encode_bypass_bins(rem, 5)
    enc.encode_bin(CTX_CHROMA_PRED, 0)    # DM
    cbf_cb = int(ctu["levels_cb"].any())
    cbf_cr = int(ctu["levels_cr"].any())
    cbf_y = int(ctu["levels_y"].any())
    enc.encode_bin(CTX_QT_CBF_CHROMA, cbf_cb)
    enc.encode_bin(CTX_QT_CBF_CHROMA, cbf_cr)
    enc.encode_bin(CTX_QT_CBF_LUMA + 1, cbf_y)
    if qp_delta is not None and (cbf_y or cbf_cb or cbf_cr):
        encode_cu_qp_delta(enc, qp_delta)
    if cbf_y:
        residual_coding(enc, ctu["levels_y"], 4, 0, 0,
                        sign_hide=sign_hide)
    if cbf_cb:
        residual_coding(enc, ctu["levels_cb"], 3, 1, 0,
                        sign_hide=sign_hide)
    if cbf_cr:
        residual_coding(enc, ctu["levels_cr"], 3, 2, 0,
                        sign_hide=sign_hide)


def _encode_residual_root(enc: CabacEncoder, ctu: dict,
                          qp_delta: int | None = None,
                          sign_hide: bool = False) -> None:
    """rqt_root_cbf + transform tree for a non-merge inter CU."""
    cbf_cb = int(ctu["levels_cb"].any())
    cbf_cr = int(ctu["levels_cr"].any())
    cbf_y = int(ctu["levels_y"].any())
    root = 1 if (cbf_y or cbf_cb or cbf_cr) else 0
    enc.encode_bin(CTX_RQT_ROOT_CBF, root)
    if root:
        enc.encode_bin(CTX_QT_CBF_CHROMA, cbf_cb)
        enc.encode_bin(CTX_QT_CBF_CHROMA, cbf_cr)
        if cbf_cb or cbf_cr:
            enc.encode_bin(CTX_QT_CBF_LUMA + 1, cbf_y)
        else:
            assert cbf_y, "rqt_root_cbf=1 with no coded blocks"
        if qp_delta is not None:
            encode_cu_qp_delta(enc, qp_delta)
        if cbf_y:
            residual_coding(enc, ctu["levels_y"], 4, 0, 0,
                            sign_hide=sign_hide)
        if cbf_cb:
            residual_coding(enc, ctu["levels_cb"], 3, 1, 0,
                            sign_hide=sign_hide)
        if cbf_cr:
            residual_coding(enc, ctu["levels_cr"], 3, 2, 0,
                            sign_hide=sign_hide)


def encode_b_ctu16(enc: CabacEncoder, ctu: dict,
                   left_skip: int, above_skip: int,
                   cand_a_intra_mode: int, max_merge: int = 2,
                   qp_delta: int | None = None,
                   sign_hide: bool = False) -> None:
    """Encode one B-slice CTU (CU16 2Nx2N).

    ctu dict keys: kind ('skip'|'inter'|'intra'); merge_idx;
    inter_dir (1 = L0, 2 = L1, 3 = BI); mvd0/mvd1 (x, y); mvp0/mvp1;
    luma_mode; levels_y/cb/cr.  One active ref per list, so no ref_idx
    bins (spec 7.3.8.6: signaled only when num_ref_idx_active > 1).
    """
    skip = 1 if ctu["kind"] == "skip" else 0
    enc.encode_bin(CTX_CU_SKIP + left_skip + above_skip, skip)
    if skip:
        encode_merge_idx(enc, ctu["merge_idx"], max_merge)
        return
    intra = ctu["kind"] == "intra"
    enc.encode_bin(CTX_PRED_MODE, 1 if intra else 0)
    enc.encode_bin(CTX_PART_MODE, 1)   # PART_2Nx2N
    if intra:
        _encode_intra_in_inter(enc, ctu, cand_a_intra_mode, qp_delta,
                               sign_hide)
        return
    enc.encode_bin(CTX_MERGE_FLAG, 0)
    # inter_pred_idc (spec 9.3.4.2.2: bin0 ctx = CtDepth (0 for CU=CTU),
    # bin1 ctx = 4); binarization: BI -> '1', L0 -> '00', L1 -> '01'
    d = ctu["inter_dir"]
    enc.encode_bin(CTX_INTER_DIR + 0, 1 if d == 3 else 0)
    if d != 3:
        enc.encode_bin(CTX_INTER_DIR + 4, 1 if d == 2 else 0)
    if d != 2:                          # uses L0
        encode_mvd(enc, ctu["mvd0"][0], ctu["mvd0"][1])
        enc.encode_bin(CTX_MVP, ctu["mvp0"])
    if d != 1:                          # uses L1 (mvd_l1_zero_flag = 0)
        encode_mvd(enc, ctu["mvd1"][0], ctu["mvd1"][1])
        enc.encode_bin(CTX_MVP, ctu["mvp1"])
    _encode_residual_root(enc, ctu, qp_delta, sign_hide)


def encode_cu_pb(enc: CabacEncoder, slice_type: str, cells: int,
                 cu: dict, left_skip: int, above_skip: int,
                 cand_a_intra: int, cand_b_intra: int,
                 max_merge: int = 2, qp_delta: int | None = None,
                 ct_depth: int = 0, sign_hide: bool = False,
                 num_ref0: int = 1) -> None:
    """One P/B-slice CU of size cells*16 (PART_2Nx2N) — generalizes
    encode_inter_ctu16/encode_b_ctu16 to the CTB32 quadtree (mirror of
    native/cabac.cpp code_cu; spec 7.3.8.5/7.3.8.6).

    cu keys: kind ('skip'|'inter'|'intra'); merge_idx; levels_y/cb/cr
    (TU-sized: 32/16 for cells=2, 16/8 for cells=1); P: mvd, mvp_idx;
    B: inter_dir, mvd0/mvp0, mvd1/mvp1; intra: luma_mode.
    ct_depth: coding-tree depth (inter_pred_idc bin0 ctx, 9.3.4.2.2).
    """
    skip = cu["kind"] == "skip"
    enc.encode_bin(CTX_CU_SKIP + left_skip + above_skip,
                   1 if skip else 0)
    if skip:
        encode_merge_idx(enc, cu["merge_idx"], max_merge)
        return
    intra = cu["kind"] == "intra"
    enc.encode_bin(CTX_PRED_MODE, 1 if intra else 0)
    # part_mode: always coded for inter; for intra only at min CB size
    if not intra or cells == 1:
        enc.encode_bin(CTX_PART_MODE, 1)
    cbf_cb = int(cu["levels_cb"].any())
    cbf_cr = int(cu["levels_cr"].any())
    cbf_y = int(cu["levels_y"].any())
    log2l = 4 if cells == 1 else 5

    def residuals():
        if cbf_y:
            residual_coding(enc, cu["levels_y"], log2l, 0, 0,
                            sign_hide=sign_hide)
        if cbf_cb:
            residual_coding(enc, cu["levels_cb"], log2l - 1, 1, 0,
                            sign_hide=sign_hide)
        if cbf_cr:
            residual_coding(enc, cu["levels_cr"], log2l - 1, 2, 0,
                            sign_hide=sign_hide)

    if intra:
        _encode_intra_luma_mode(enc, cu["luma_mode"],
                                mpm_list(cand_a_intra, cand_b_intra))
        enc.encode_bin(CTX_CHROMA_PRED, 0)          # DM chroma
        enc.encode_bin(CTX_QT_CBF_CHROMA, cbf_cb)
        enc.encode_bin(CTX_QT_CBF_CHROMA, cbf_cr)
        enc.encode_bin(CTX_QT_CBF_LUMA + 1, cbf_y)
        if qp_delta is not None and (cbf_y or cbf_cb or cbf_cr):
            encode_cu_qp_delta(enc, qp_delta)
        residuals()
        return
    enc.encode_bin(CTX_MERGE_FLAG, 0)
    if slice_type == "B":
        d = cu["inter_dir"]
        enc.encode_bin(CTX_INTER_DIR + ct_depth, 1 if d == 3 else 0)
        if d != 3:
            enc.encode_bin(CTX_INTER_DIR + 4, 1 if d == 2 else 0)
        if d != 2:
            encode_mvd(enc, cu["mvd0"][0], cu["mvd0"][1])
            enc.encode_bin(CTX_MVP, cu["mvp0"])
        if d != 1:
            encode_mvd(enc, cu["mvd1"][0], cu["mvd1"][1])
            enc.encode_bin(CTX_MVP, cu["mvp1"])
    else:
        encode_ref_idx(enc, cu.get("ref_idx", 0), num_ref0)
        encode_mvd(enc, cu["mvd"][0], cu["mvd"][1])
        enc.encode_bin(CTX_MVP, cu["mvp_idx"])
    root = 1 if (cbf_y or cbf_cb or cbf_cr) else 0
    enc.encode_bin(CTX_RQT_ROOT_CBF, root)
    if root:
        enc.encode_bin(CTX_QT_CBF_CHROMA, cbf_cb)
        enc.encode_bin(CTX_QT_CBF_CHROMA, cbf_cr)
        if cbf_cb or cbf_cr:
            enc.encode_bin(CTX_QT_CBF_LUMA + 1, cbf_y)
        if qp_delta is not None:
            encode_cu_qp_delta(enc, qp_delta)
        residuals()


# ---- SAO syntax (spec 7.3.8.3, luma component) ------------------------------

def encode_sao_luma(enc: CabacEncoder, type_idx: int, eo_class: int,
                    band_pos: int, offsets, left_avail: bool,
                    up_avail: bool) -> None:
    """Per-CTU SAO parameters, luma only (slice_sao_chroma = 0).
    v1 codes explicit params (merge flags = 0); offsets are SIGNED
    (EO signs are inferred from the category, BO signs are coded)."""
    if left_avail:
        enc.encode_bin(CTX_SAO_MERGE, 0)     # sao_merge_left_flag
    if up_avail:
        enc.encode_bin(CTX_SAO_MERGE, 0)     # sao_merge_up_flag
    enc.encode_bin(CTX_SAO_TYPE, 1 if type_idx else 0)
    if not type_idx:
        return
    enc.encode_bypass(1 if type_idx == 2 else 0)   # 1 -> EO, 0 -> BO
    for k in range(4):
        a = abs(int(offsets[k]))
        for _ in range(a):
            enc.encode_bypass(1)
        if a < 7:                            # TR cMax = 7 (8-bit)
            enc.encode_bypass(0)
    if type_idx == 1:                        # BO: signs + band position
        for k in range(4):
            if offsets[k]:
                enc.encode_bypass(1 if offsets[k] < 0 else 0)
        enc.encode_bypass_bins(band_pos, 5)
    else:                                    # EO: class (2 bits)
        enc.encode_bypass_bins(eo_class, 2)


def decode_sao_luma(d, left_avail: bool, up_avail: bool):
    """Decoder twin; returns (type_idx, eo_class, band_pos,
    offsets[4] signed)."""
    if left_avail:
        assert d.decode_bin(CTX_SAO_MERGE) == 0, "sao merge unsupported"
    if up_avail:
        assert d.decode_bin(CTX_SAO_MERGE) == 0, "sao merge unsupported"
    offsets = [0, 0, 0, 0]
    if not d.decode_bin(CTX_SAO_TYPE):
        return 0, 0, 0, offsets
    type_idx = 2 if d.decode_bypass() else 1
    for k in range(4):
        a = 0
        while a < 7 and d.decode_bypass():
            a += 1
        offsets[k] = a
    eo_class = band_pos = 0
    if type_idx == 1:
        for k in range(4):
            if offsets[k] and d.decode_bypass():
                offsets[k] = -offsets[k]
        band_pos = d.decode_bypass_bins(5)
    else:
        eo_class = d.decode_bypass_bins(2)
        offsets[2] = -offsets[2]             # cat 3/4 inferred negative
        offsets[3] = -offsets[3]
    return type_idx, eo_class, band_pos, offsets


def _sao_offsets_abs(enc: CabacEncoder, offsets) -> None:
    for k in range(4):
        a = abs(int(offsets[k]))
        for _ in range(a):
            enc.encode_bypass(1)
        if a < 7:                            # TR cMax = 7 (8-bit)
            enc.encode_bypass(0)


def _sao_bo_tail(enc: CabacEncoder, offsets, band_pos: int) -> None:
    for k in range(4):
        if offsets[k]:
            enc.encode_bypass(1 if offsets[k] < 0 else 0)
    enc.encode_bypass_bins(band_pos, 5)


def encode_sao_ctu(enc: CabacEncoder, luma, chroma, left_avail: bool,
                   up_avail: bool) -> None:
    """Full per-CTU SAO syntax (spec 7.3.8.3): luma section then the
    chroma section with shared type/EO-class and per-component
    offsets/band positions.  luma = (type, eo_class, band_pos,
    offsets[4]) or None; chroma = (type, eo_class, bp_cb, off_cb,
    bp_cr, off_cr) or None.  Merge flags coded as 0 (explicit params).
    """
    if left_avail:
        enc.encode_bin(CTX_SAO_MERGE, 0)
    if up_avail:
        enc.encode_bin(CTX_SAO_MERGE, 0)
    if luma is not None:
        t, eo, bp, offs = luma
        enc.encode_bin(CTX_SAO_TYPE, 1 if t else 0)
        if t:
            enc.encode_bypass(1 if t == 2 else 0)
            _sao_offsets_abs(enc, offs)
            if t == 1:
                _sao_bo_tail(enc, offs, bp)
            else:
                enc.encode_bypass_bins(eo, 2)
    if chroma is not None:
        t, eo, bp_cb, off_cb, bp_cr, off_cr = chroma
        # sao_type_idx_chroma shares the sao_type_idx context (9.3.4.2)
        enc.encode_bin(CTX_SAO_TYPE, 1 if t else 0)
        if t:
            enc.encode_bypass(1 if t == 2 else 0)
            _sao_offsets_abs(enc, off_cb)
            if t == 1:
                _sao_bo_tail(enc, off_cb, bp_cb)
            else:
                enc.encode_bypass_bins(eo, 2)
            _sao_offsets_abs(enc, off_cr)
            if t == 1:
                _sao_bo_tail(enc, off_cr, bp_cr)


def _decode_sao_offsets_abs(d):
    offs = [0, 0, 0, 0]
    for k in range(4):
        a = 0
        while a < 7 and d.decode_bypass():
            a += 1
        offs[k] = a
    return offs


def _decode_sao_bo_tail(d, offs):
    for k in range(4):
        if offs[k] and d.decode_bypass():
            offs[k] = -offs[k]
    return d.decode_bypass_bins(5)


def decode_sao_ctu(d, has_luma: bool, has_chroma: bool,
                   left_avail: bool, up_avail: bool):
    """Decoder twin; returns (luma, chroma) tuples as encode_sao_ctu
    takes (None for disabled components)."""
    if left_avail:
        assert d.decode_bin(CTX_SAO_MERGE) == 0, "sao merge unsupported"
    if up_avail:
        assert d.decode_bin(CTX_SAO_MERGE) == 0, "sao merge unsupported"
    luma = chroma = None
    if has_luma:
        t = eo = bp = 0
        offs = [0, 0, 0, 0]
        if d.decode_bin(CTX_SAO_TYPE):
            t = 2 if d.decode_bypass() else 1
            offs = _decode_sao_offsets_abs(d)
            if t == 1:
                bp = _decode_sao_bo_tail(d, offs)
            else:
                eo = d.decode_bypass_bins(2)
                offs[2] = -offs[2]
                offs[3] = -offs[3]
        luma = (t, eo, bp, offs)
    if has_chroma:
        t = eo = bp_cb = bp_cr = 0
        off_cb = [0, 0, 0, 0]
        off_cr = [0, 0, 0, 0]
        if d.decode_bin(CTX_SAO_TYPE):
            t = 2 if d.decode_bypass() else 1
            off_cb = _decode_sao_offsets_abs(d)
            if t == 1:
                bp_cb = _decode_sao_bo_tail(d, off_cb)
            else:
                eo = d.decode_bypass_bins(2)
                off_cb[2] = -off_cb[2]
                off_cb[3] = -off_cb[3]
            off_cr = _decode_sao_offsets_abs(d)
            if t == 1:
                bp_cr = _decode_sao_bo_tail(d, off_cr)
            else:
                off_cr[2] = -off_cr[2]
                off_cr[3] = -off_cr[3]
        chroma = (t, eo, bp_cb, off_cb, bp_cr, off_cr)
    return luma, chroma
