"""Conformance-checking HEVC decoder for the encoder's emitted subset.

The reference relies on external golden decoders for bitstream
validation (`test/regression-tests.txt:3-7`); this environment has none,
so this module is the oracle: it parses Annex-B output (headers via
BitReader, slice data via the *normative* CABAC decoder) and rebuilds
the reconstruction with the scalar-exact numpy ops.  Encoder recon and
decoder recon must match bit-exactly.

Supported today: Main profile I/P/B; CTU16 flat pipeline and CTU32
depth-1 CU quadtree (split_cu_flag, TU32+TU16-chroma / 4x CU16 with
z-scan availability), diag scans, deblock/SAO/WPP/per-CU QP.  The
parser asserts loudly on anything else so unsupported-feature bugs
can't slip through silently.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..bitstream.bitio import BitReader
from ..bitstream.nal import (NAL_IDR_N_LP, NAL_IDR_W_RADL, NAL_PPS, NAL_SPS,
                             NAL_VPS, split_annexb)
from ..cabac.engine import CabacDecoder
from ..cabac.scans import SCAN_VER, full_scan, scan_order
from ..cabac import syntax as S
from .ctx import (last_ctx_params_dec, last_prefix_min_dec,
                  mpm_list_dec, sig_ctx_inc_dec)
from ..ops.intra_ref import (filter_flag, predict_mode, smooth_refs,
                             ref_sample_substitution)
from ..ops.quant import chroma_qp, dequant_np
from ..ops.transforms import inv_transform_np


@dataclass
class DecSps:
    width: int = 0
    height: int = 0
    conf_right: int = 0
    conf_bottom: int = 0
    bit_depth: int = 8
    log2_ctb: int = 4
    log2_min_cb: int = 4
    log2_min_tb: int = 2
    log2_max_tb: int = 4
    sao: bool = False
    amp: bool = False


@dataclass
class DecPps:
    init_qp: int = 26
    sign_hide: bool = False
    cu_qp_delta: bool = False
    cb_qp_offset: int = 0
    cr_qp_offset: int = 0
    deblock_disabled: bool = True
    entropy_sync: bool = False
    transquant_bypass: bool = False


def _parse_ptl(r: BitReader) -> None:
    r.read(2 + 1 + 5)
    r.read(32)
    r.read(48)
    r.read(8)


def parse_sps(rbsp: bytes) -> DecSps:
    r = BitReader(rbsp)
    s = DecSps()
    r.read(4)
    assert r.read(3) == 0, "sub-layers unsupported"
    r.read(1)
    _parse_ptl(r)
    assert r.read_ue() == 0
    assert r.read_ue() == 1, "only 4:2:0"
    s.width = r.read_ue()
    s.height = r.read_ue()
    if r.read_flag():
        assert r.read_ue() == 0
        s.conf_right = r.read_ue()
        assert r.read_ue() == 0
        s.conf_bottom = r.read_ue()
    s.bit_depth = 8 + r.read_ue()
    assert 8 + r.read_ue() == s.bit_depth
    r.read_ue()  # log2_max_poc_lsb
    r.read_flag()
    r.read_ue(); r.read_ue(); r.read_ue()   # dpb sizes
    s.log2_min_cb = 3 + r.read_ue()
    s.log2_ctb = s.log2_min_cb + r.read_ue()
    s.log2_min_tb = 2 + r.read_ue()
    s.log2_max_tb = s.log2_min_tb + r.read_ue()
    r.read_ue(); r.read_ue()                # transform hierarchy depths
    assert r.read_flag() == 0, "scaling lists unsupported"
    s.amp = bool(r.read_flag())
    s.sao = bool(r.read_flag())
    assert r.read_flag() == 0, "pcm unsupported"
    assert r.read_ue() == 0, "RPS sets unsupported"
    assert r.read_flag() == 0, "long-term refs unsupported"
    r.read_flag()  # temporal mvp
    r.read_flag()  # strong intra smoothing
    return s


def parse_pps(rbsp: bytes) -> DecPps:
    r = BitReader(rbsp)
    p = DecPps()
    assert r.read_ue() == 0 and r.read_ue() == 0
    assert r.read_flag() == 0      # dependent slices
    r.read_flag()
    assert r.read(3) == 0
    p.sign_hide = bool(r.read_flag())
    assert r.read_flag() == 0      # cabac_init_present
    r.read_ue(); r.read_ue()
    p.init_qp = 26 + r.read_se()
    assert r.read_flag() == 0      # constrained intra
    assert r.read_flag() == 0      # transform skip
    p.cu_qp_delta = bool(r.read_flag())
    if p.cu_qp_delta:
        r.read_ue()
    p.cb_qp_offset = r.read_se()
    p.cr_qp_offset = r.read_se()
    assert r.read_flag() == 0
    r.read_flag(); r.read_flag()   # weighted pred flags
    p.transquant_bypass = bool(r.read_flag())
    assert r.read_flag() == 0      # tiles
    p.entropy_sync = bool(r.read_flag())
    r.read_flag()                  # loop filter across slices
    if r.read_flag():              # deblocking control present
        assert r.read_flag() == 0  # override enabled
        p.deblock_disabled = bool(r.read_flag())
        if not p.deblock_disabled:
            r.read_se(); r.read_se()
    return p


def _decode_last_pos(d: CabacDecoder, log2_size: int, c_idx: int,
                     scan_idx: int) -> tuple[int, int]:
    off, shift = last_ctx_params_dec(log2_size, c_idx)
    cmax = (log2_size << 1) - 1
    groups = []
    for base in (S.CTX_LAST_X, S.CTX_LAST_Y):
        g = 0
        while g < cmax and d.decode_bin(base + off + (g >> shift)):
            g += 1
        groups.append(g)
    coords = []
    for g in groups:
        if g > 3:
            nbits = (g >> 1) - 1
            coords.append(last_prefix_min_dec(g)
                          + d.decode_bypass_bins(nbits))
        else:
            coords.append(g)
    cx, cy = coords
    return (cy, cx) if scan_idx == SCAN_VER else (cx, cy)


def _decode_remaining(d: CabacDecoder, rice: int) -> int:
    prefix = 0
    while prefix < 32 and d.decode_bypass():
        prefix += 1
    assert prefix < 32, "corrupt remaining prefix"
    if prefix < 3:
        return (prefix << rice) + d.decode_bypass_bins(rice)
    length = prefix - 3
    rest = d.decode_bypass_bins(length + rice)
    rem_hi = rest >> rice
    return ((3 + (1 << length) - 1 + rem_hi) << rice) + \
        (rest & ((1 << rice) - 1))


def decode_residual(d: CabacDecoder, log2_size: int, c_idx: int,
                    scan_idx: int, sign_hide: bool = False) -> np.ndarray:
    n = 1 << log2_size
    lv = np.zeros((n, n), dtype=np.int32)
    scan = full_scan(scan_idx, log2_size)
    xl, yl = _decode_last_pos(d, log2_size, c_idx, scan_idx)
    # find scan position of (xl, yl)
    last_pos = next(i for i, (x, y) in enumerate(scan)
                    if x == xl and y == yl)
    n_sb = max(n >> 2, 1)
    sb_scan = scan_order(scan_idx, n_sb) if n_sb > 1 else \
        np.array([[0, 0]], dtype=np.int32)
    inner = scan_order(scan_idx, 4)
    csbf = np.zeros((n_sb, n_sb), dtype=np.int32)
    last_sb = last_pos >> 4
    c1 = 1  # greater1 context carry resets per transform block
    for i in range(last_sb, -1, -1):
        sbx, sby = int(sb_scan[i][0]), int(sb_scan[i][1])
        right = int(csbf[sby, sbx + 1]) if sbx + 1 < n_sb else 0
        below = int(csbf[sby + 1, sbx]) if sby + 1 < n_sb else 0
        infer_dc = False
        if i == last_sb or i == 0:
            coded = 1
        else:
            ctx = min(right + below, 1) + (2 if c_idx else 0)
            coded = d.decode_bin(S.CTX_CSBF + ctx)
            infer_dc = bool(coded)
        csbf[sby, sbx] = coded
        if not coded:
            continue
        start = 15 if i < last_sb else (last_pos & 15) - 1
        sig_pos = []
        if i == last_sb:
            sig_pos.append(last_pos & 15)
        any_sig = bool(sig_pos)
        for np_ in range(start, -1, -1):
            if np_ == 0 and infer_dc and not any_sig:
                sig = 1
            else:
                xc = sbx * 4 + int(inner[np_][0])
                yc = sby * 4 + int(inner[np_][1])
                ctx = sig_ctx_inc_dec(xc, yc, log2_size, c_idx, scan_idx,
                                    right, below)
                sig = d.decode_bin(S.CTX_SIG + ctx)
            if sig:
                sig_pos.append(np_)
                any_sig = True
        num_sig = len(sig_pos)
        ctx_set = 2 if (i > 0 and c_idx == 0) else 0
        if c1 == 0:
            ctx_set += 1
        c1 = 1
        num_c1 = min(num_sig, 8)
        gt1 = []
        for _ in range(num_c1):
            ctx = (ctx_set * 4 + min(c1, 3)) + (16 if c_idx else 0)
            f = d.decode_bin(S.CTX_GT1 + ctx)
            gt1.append(f)
            if f:
                c1 = 0
            elif 0 < c1 < 3:
                c1 += 1
        first_gt1 = next((k for k, f in enumerate(gt1) if f), -1)
        gt2 = 0
        if first_gt1 >= 0:
            gt2 = d.decode_bin(S.CTX_GT2 + ctx_set + (4 if c_idx else 0))
        # signHidden (spec 7.4.9.11): the first significant
        # coefficient's sign is inferred from level-sum parity
        sign_hidden = sign_hide and num_sig > 1 and \
            (sig_pos[0] - sig_pos[-1] > 3)
        signs = [d.decode_bypass()
                 for _ in range(num_sig - (1 if sign_hidden else 0))]
        rice = 0
        first2 = 1
        levels = []
        for idx in range(num_sig):
            base = 1 + (gt1[idx] if idx < num_c1 else 0) + \
                (gt2 if idx == first_gt1 else 0)
            base_level = (2 + first2) if idx < 8 else 1
            v = base
            if base >= base_level:
                rem = _decode_remaining(d, rice)
                v = base + rem
                if v > (3 << rice):
                    rice = min(rice + 1, 4)
            levels.append(v)
            if v >= 2:
                first2 = 0
        if sign_hidden:
            signs.append(1 if (sum(levels) & 1) else 0)
        for np_, v, s in zip(sig_pos, levels, signs):
            xc = sbx * 4 + int(inner[np_][0])
            yc = sby * 4 + int(inner[np_][1])
            lv[yc, xc] = -v if s else v
    return lv


@dataclass
class DecodedFrame:
    y: np.ndarray              # cropped output planes
    cb: np.ndarray
    cr: np.ndarray
    modes: np.ndarray
    poc: int = 0
    # full (padded-to-CTU, uncropped) planes kept as reference pictures
    full_y: np.ndarray | None = None
    full_cb: np.ndarray | None = None
    full_cr: np.ndarray | None = None


def decode_stream(stream: bytes) -> list[DecodedFrame]:
    """Decode an Annex-B stream; returns cropped planes per frame in
    OUTPUT (display) order: frames are reordered by (CVS index, POC),
    the normative output order for the emitted streams."""
    from ..bitstream.nal import NAL_TRAIL_R, NAL_TRAIL_N
    sps = pps = None
    out = []          # (cvs_idx, poc, frame)
    dpb: dict[int, DecodedFrame] = {}
    cvs = -1
    for nal_type, _tid, rbsp in split_annexb(stream):
        if nal_type == NAL_VPS:
            continue
        if nal_type == NAL_SPS:
            sps = parse_sps(rbsp)
        elif nal_type == NAL_PPS:
            pps = parse_pps(rbsp)
        elif nal_type in (NAL_IDR_W_RADL, NAL_IDR_N_LP):
            assert sps and pps
            cvs += 1
            dpb = {}
            fr = _decode_idr_frame(rbsp, sps, pps, nal_type)
            fr.poc = 0
            dpb[0] = fr
            out.append((cvs, 0, fr))
        elif nal_type in (NAL_TRAIL_R, NAL_TRAIL_N):
            assert sps and pps
            fr = _decode_inter_frame(rbsp, sps, pps, dpb)
            if nal_type == NAL_TRAIL_R:
                dpb[fr.poc] = fr
            out.append((cvs, fr.poc, fr))
        elif nal_type in (39, 40):     # prefix / suffix SEI
            _handle_sei(rbsp, out[-1][2] if out else None)
        elif nal_type in (35, 36, 37):  # AUD / EOS / EOB
            pass
        else:
            raise AssertionError(f"unsupported NAL type {nal_type}")
    out.sort(key=lambda t: (t[0], t[1]))
    return [f for _, _, f in out]


def _handle_sei(rbsp: bytes, last_frame: DecodedFrame | None) -> None:
    """Parse SEI messages; VERIFY decoded-picture-hash SEIs against the
    most recently decoded picture (spec D.3.19) — a failed hash means
    the encoder's recon diverged from the normative decode."""
    from ..bitstream import sei as S_sei
    pos = 0
    # strip rbsp trailing: keep scanning while a full message fits
    while pos < len(rbsp) - 1:
        ptype = 0
        while rbsp[pos] == 255:
            ptype += 255
            pos += 1
        ptype += rbsp[pos]
        pos += 1
        size = 0
        while rbsp[pos] == 255:
            size += 255
            pos += 1
        size += rbsp[pos]
        pos += 1
        payload = rbsp[pos:pos + size]
        pos += size
        if ptype == S_sei.SEI_DECODED_PICTURE_HASH:
            assert last_frame is not None, "hash SEI before any slice"
            ht, digests = S_sei.parse_decoded_picture_hash(payload)
            planes = (last_frame.full_y, last_frame.full_cb,
                      last_frame.full_cr)
            expect = S_sei.decoded_picture_hash(planes, ht)
            got = bytes([ht]) + b"".join(digests)
            assert got == expect, \
                f"decoded picture hash mismatch (type {ht})"
        # other SEI types: parsed and skipped (metadata carriage)
        if pos < len(rbsp) and rbsp[pos] == 0x80:
            break                       # rbsp_trailing_bits


def _parse_entry_points(r: BitReader, pps: DecPps) -> list[int]:
    """Slice header entry points (7.3.6.1) -> substream byte sizes."""
    if not pps.entropy_sync:
        return []
    n_ep = r.read_ue()
    if not n_ep:
        return []
    olen = r.read_ue() + 1
    return [r.read(olen) + 1 for _ in range(n_ep)]


def _slice_ctu_loop(payload: bytes, slice_type: str, qp: int,
                    hc: int, wc: int, entry: list[int], qpctx,
                    sao, ctu_fn) -> None:
    """Runs ctu_fn(d, cx, cy) over the slice.  With entry points
    (WPP), each CTU row is its own CABAC substream with context
    inheritance from the above-right CTU (spec 9.3.1) and
    end_of_subset_one_bit terminators; qPY_PREV resets per row
    (spec 8.6.1)."""
    if not entry:
        d = CabacDecoder(payload, slice_type, qp)
        for cy in range(hc):
            for cx in range(wc):
                if sao is not None:
                    sao.parse(d, cx, cy)
                qpctx["qg_coded"] = False    # new QG (== CTB)
                ctu_fn(d, cx, cy)
                eos = d.decode_terminate()
                is_last = (cy == hc - 1 and cx == wc - 1)
                assert eos == (1 if is_last else 0), \
                    f"end_of_slice mismatch at CTU ({cx},{cy})"
        return
    bounds = [0]
    for o in entry:
        bounds.append(bounds[-1] + o)
    bounds.append(len(payload))
    assert len(bounds) == hc + 2 or len(bounds) - 1 == hc, \
        (len(entry), hc)
    row_init = None
    for cy in range(hc):
        sub = payload[bounds[cy]:bounds[cy + 1]]
        d = CabacDecoder(sub, slice_type, qp,
                         states=row_init if cy else None)
        qpctx["prev"] = qp            # per-row qPY_PREV reset
        for cx in range(wc):
            if sao is not None:
                sao.parse(d, cx, cy)
            qpctx["qg_coded"] = False        # new QG (== CTB)
            ctu_fn(d, cx, cy)
            if cx == 1:
                row_init = d.save_contexts()
            eos = d.decode_terminate()
            is_last = (cy == hc - 1 and cx == wc - 1)
            assert eos == (1 if is_last else 0), \
                f"end_of_slice mismatch at CTU ({cx},{cy})"
        if cy < hc - 1:
            assert d.decode_terminate() == 1, "end_of_subset missing"


class _SaoState:
    """Per-slice SAO parameter collection + normative apply
    (spec 7.3.8.3 parse + 8.7.3 application, luma + chroma)."""

    def __init__(self, hc: int, wc: int, has_luma: bool,
                 has_chroma: bool):
        self.hc, self.wc = hc, wc
        self.has_luma = has_luma
        self.has_chroma = has_chroma
        n = hc * wc
        self.type = np.zeros(n, np.int32)
        self.eo = np.zeros(n, np.int32)
        self.bp = np.zeros(n, np.int32)
        self.off = np.zeros((n, 4), np.int32)
        self.c_type = np.zeros(n, np.int32)
        self.c_eo = np.zeros(n, np.int32)
        self.c_bp_cb = np.zeros(n, np.int32)
        self.c_off_cb = np.zeros((n, 4), np.int32)
        self.c_bp_cr = np.zeros(n, np.int32)
        self.c_off_cr = np.zeros((n, 4), np.int32)

    def parse(self, d, cx: int, cy: int) -> None:
        luma, chroma = S.decode_sao_ctu(d, self.has_luma,
                                        self.has_chroma, cx > 0, cy > 0)
        k = cy * self.wc + cx
        if luma is not None:
            self.type[k], self.eo[k], self.bp[k], self.off[k] = luma
        if chroma is not None:
            (self.c_type[k], self.c_eo[k], self.c_bp_cb[k],
             self.c_off_cb[k], self.c_bp_cr[k],
             self.c_off_cr[k]) = chroma

    def apply(self, y_pl: np.ndarray, pad: int, hc: int, wc: int,
              cb_pl: np.ndarray | None = None,
              cr_pl: np.ndarray | None = None, ctb: int = 16) -> None:
        from ..ops.sao import sao_apply_np
        cb2 = ctb // 2
        if self.has_luma:
            region = y_pl[pad:pad + hc * ctb, pad:pad + wc * ctb]
            y_pl[pad:pad + hc * ctb, pad:pad + wc * ctb] = sao_apply_np(
                region, self.type, self.eo, self.bp, self.off, ctb)
        if self.has_chroma and cb_pl is not None:
            hp = pad // 2
            for pl, bp, off in ((cb_pl, self.c_bp_cb, self.c_off_cb),
                                (cr_pl, self.c_bp_cr, self.c_off_cr)):
                reg = pl[hp:hp + hc * cb2, hp:hp + wc * cb2]
                pl[hp:hp + hc * cb2, hp:hp + wc * cb2] = sao_apply_np(
                    reg, self.c_type, self.c_eo, bp, off, cb2)


def _decode_idr_frame(rbsp: bytes, sps: DecSps, pps: DecPps,
                      nal_type: int) -> DecodedFrame:
    ctb = 1 << sps.log2_ctb
    assert ctb in (16, 32) and sps.log2_min_cb == 4, \
        "decoder supports CTU16/CTU32 with min CU 16"
    r = BitReader(rbsp)
    assert r.read_flag() == 1          # first_slice_segment_in_pic
    r.read_flag()                      # no_output_of_prior_pics
    assert r.read_ue() == 0            # pps id
    st = r.read_ue()
    assert st == 2, "only I slices in v1 decoder"
    sao_luma = sao_chroma = 0
    if sps.sao:
        sao_luma = r.read_flag()
        sao_chroma = r.read_flag()
    qp = pps.init_qp + r.read_se()
    entry = _parse_entry_points(r, pps)
    assert r.read_flag() == 1          # byte_alignment stop bit
    r.byte_align()
    payload = rbsp[r.bit_pos // 8:]

    wc = -(-sps.width // ctb)
    hc = -(-sps.height // ctb)
    pad = ctb
    ph, pw = hc * ctb, wc * ctb
    y_pl = np.zeros((ph + 2 * pad, pw + 2 * pad), dtype=np.int32)
    cb_pl = np.zeros((ph // 2 + pad, pw // 2 + pad), dtype=np.int32)
    cr_pl = np.zeros_like(cb_pl)
    modes = np.full((ph // 16, pw // 16), -1, dtype=np.int32)
    split_map = np.zeros((hc, wc), dtype=np.int32)
    qp_c_cb = chroma_qp(qp, pps.cb_qp_offset)
    qp_c_cr = chroma_qp(qp, pps.cr_qp_offset)
    qpctx = {"prev": qp,
             "qp16": np.full((ph // 16, pw // 16), qp, np.int32)}
    sao = _SaoState(hc, wc, bool(sao_luma), bool(sao_chroma)) \
        if (sao_luma or sao_chroma) else None

    if ctb == 16:
        def ctu_fn(d, cx, cy):
            _decode_ctu16(d, sps, pps, qpctx, cx, cy, wc, hc,
                          y_pl, cb_pl, cr_pl, modes, pad)
    else:
        def ctu_fn(d, cx, cy):
            _decode_ctu_tree(d, sps, pps, qpctx, cx, cy, wc, hc,
                             y_pl, cb_pl, cr_pl, modes, split_map, pad)
    _slice_ctu_loop(payload, "I", qp, hc, wc, entry, qpctx, sao,
                    ctu_fn)
    if not pps.deblock_disabled:
        hp = pad // 2
        from ..ops.deblock import (deblock_chroma_bs_np,
                                   deblock_luma_bs_np,
                                   intra_tree_bs_maps)
        from ..ops.quant import chroma_qp_np
        h16, w16 = ph // 16, pw // 16
        if ctb == 16:
            # every 16-grid edge is an intra CU+TU boundary -> bS = 2
            bs_v = np.full((h16, w16 - 1), 2, np.int32)
            bs_h = np.full((h16 - 1, w16), 2, np.int32)
        else:
            bs_v, bs_h = intra_tree_bs_maps(split_map, h16, w16, xp=np)
        # per-edge QP from the decoded per-CU QpY map (spec 8.7.2.5.3)
        q16 = qpctx["qp16"]
        qp_v = (q16[:, :-1] + q16[:, 1:] + 1) >> 1
        qp_h = (q16[:-1, :] + q16[1:, :] + 1) >> 1
        y_pl[pad:pad + ph, pad:pad + pw] = deblock_luma_bs_np(
            y_pl[pad:pad + ph, pad:pad + pw], qp, bs_v, bs_h,
            qp_v=qp_v, qp_h=qp_h)
        cb_pl[hp:hp + ph // 2, hp:hp + pw // 2] = \
            deblock_chroma_bs_np(
                cb_pl[hp:hp + ph // 2, hp:hp + pw // 2], qp_c_cb,
                bs_v, bs_h,
                qpc_v=chroma_qp_np(qp_v, pps.cb_qp_offset),
                qpc_h=chroma_qp_np(qp_h, pps.cb_qp_offset))
        cr_pl[hp:hp + ph // 2, hp:hp + pw // 2] = \
            deblock_chroma_bs_np(
                cr_pl[hp:hp + ph // 2, hp:hp + pw // 2], qp_c_cr,
                bs_v, bs_h,
                qpc_v=chroma_qp_np(qp_v, pps.cr_qp_offset),
                qpc_h=chroma_qp_np(qp_h, pps.cr_qp_offset))
    if sao is not None:
        sao.apply(y_pl, pad, hc, wc, cb_pl, cr_pl, ctb=ctb)
    w, h = sps.width - 2 * sps.conf_right, sps.height - 2 * sps.conf_bottom
    hp = pad // 2
    odt = np.uint16 if sps.bit_depth > 8 else np.uint8
    fy = y_pl[pad:pad + ph, pad:pad + pw].astype(odt)
    fcb = cb_pl[hp:hp + ph // 2, hp:hp + pw // 2].astype(odt)
    fcr = cr_pl[hp:hp + ph // 2, hp:hp + pw // 2].astype(odt)
    return DecodedFrame(
        y=fy[:h, :w], cb=fcb[:h // 2, :w // 2], cr=fcr[:h // 2, :w // 2],
        modes=modes, full_y=fy, full_cb=fcb, full_cr=fcr)


def _zavail(bx: int, by: int, nx: int, ny: int, w16: int,
            h16: int) -> bool:
    """Availability (spec 6.4.1) of the 16-cell (nx, ny) for a CU whose
    top-left 16-cell is (bx, by), under CTU32 raster + z-scan order:
    the neighbor must be inside the picture and precede in decoding
    order (earlier CTU in raster, or earlier z-index in the same CTU)."""
    if nx < 0 or ny < 0 or nx >= w16 or ny >= h16:
        return False
    wc32 = w16 // 2
    c_ctu = (by // 2) * wc32 + (bx // 2)
    n_ctu = (ny // 2) * wc32 + (nx // 2)
    if n_ctu != c_ctu:
        return n_ctu < c_ctu
    return ((ny & 1) * 2 + (nx & 1)) < ((by & 1) * 2 + (bx & 1))


def _zavail_masks(bx: int, by: int, cells: int, w16: int, h16: int,
                  n: int):
    """Per-sample availability masks (at[2n], al[2n], corner) for a CU
    covering `cells` 16-cells per side with top-left cell (bx, by)."""
    seg = n // cells                  # samples per 16-cell segment
    at = np.zeros(2 * n, bool)
    al = np.zeros(2 * n, bool)
    for s in range(2 * cells):
        at[s * seg:(s + 1) * seg] = _zavail(bx, by, bx + s, by - 1,
                                            w16, h16)
        al[s * seg:(s + 1) * seg] = _zavail(bx, by, bx - 1, by + s,
                                            w16, h16)
    ac = _zavail(bx, by, bx - 1, by - 1, w16, h16)
    return at, al, ac


def _intra_recon_block(plane: np.ndarray, x0: int, y0: int, n: int,
                       mode: int, c_idx: int, resi: np.ndarray,
                       avail_left, avail_top, avail_tr=None,
                       avail_corner=None, bit_depth: int = 8) -> None:
    """Reconstruct one intra block in-place on the padded plane.
    avail_left/avail_top: bools (v1 CTU16 grid rules) or per-sample
    [2n] masks (quadtree z-scan rules, avail_corner then required)."""
    top = plane[y0 - 1, x0:x0 + 2 * n].copy()
    left = plane[y0:y0 + 2 * n, x0 - 1].copy()
    corner = int(plane[y0 - 1, x0 - 1])
    if isinstance(avail_top, np.ndarray):
        at, al, ac = avail_top, avail_left, bool(avail_corner)
    else:
        at = np.zeros(2 * n, bool)
        at[:n] = avail_top
        at[n:] = avail_tr
        al = np.zeros(2 * n, bool)
        al[:n] = avail_left        # bottom-left never available (v1 grid)
        ac = avail_left and avail_top
    top, left, corner = ref_sample_substitution(
        top, left, corner, at, al, ac, bit_depth=bit_depth)
    if filter_flag(mode, n, c_idx):
        top, left, corner = smooth_refs(top, left, corner)
    pred = predict_mode(mode, top, left, corner, n, c_idx,
                        bit_depth=bit_depth)
    rec = np.clip(pred + resi, 0, (1 << bit_depth) - 1)
    plane[y0:y0 + n, x0:x0 + n] = rec


def _cu_qp_update(d, pps, qpctx, any_cbf: int) -> int:
    """Derive this CU's QpY (spec 8.6.1 with QG == CTB): parse
    cu_qp_delta when enabled, coefficients are coded, and no delta was
    parsed yet in this QG (IsCuQpDeltaCoded); predictor is the previous
    QG's QP (left/above fall outside the CTB)."""
    if pps.cu_qp_delta and any_cbf and not qpctx.get("qg_coded", False):
        qpctx["prev"] += S.decode_cu_qp_delta(d)
        qpctx["qg_coded"] = True
    return qpctx["prev"]


def _decode_ctu16(d, sps, pps, qpctx, cx, cy, wc, hc,
                  y_pl, cb_pl, cr_pl, modes, pad):
    # CU syntax (mirror of cabac.syntax.encode_intra_ctu16)
    bypass = 0
    if pps.transquant_bypass:
        bypass = d.decode_bin(S.CTX_TQ_BYPASS)
    assert d.decode_bin(S.CTX_PART_MODE) == 1, "PART_NxN unsupported"
    cand_a = int(modes[cy, cx - 1]) if cx > 0 else 1
    mpms = mpm_list_dec(cand_a if cand_a >= 0 else 1, 1)
    if d.decode_bin(S.CTX_PREV_INTRA):
        idx = 0
        if d.decode_bypass():
            idx = 1 + d.decode_bypass()
        mode = mpms[idx]
    else:
        rem = d.decode_bypass_bins(5)
        for m in sorted(mpms):
            if rem >= m:
                rem += 1
        mode = rem
    assert d.decode_bin(S.CTX_CHROMA_PRED) == 0, "non-DM chroma unsupported"
    cbf_cb = d.decode_bin(S.CTX_QT_CBF_CHROMA + 0)
    cbf_cr = d.decode_bin(S.CTX_QT_CBF_CHROMA + 0)
    cbf_y = d.decode_bin(S.CTX_QT_CBF_LUMA + 1)
    qp = _cu_qp_update(d, pps, qpctx, cbf_y or cbf_cb or cbf_cr)
    if "qp16" in qpctx:
        qpctx["qp16"][cy, cx] = qp
    qp_cb = chroma_qp(qp, pps.cb_qp_offset)
    qp_cr = chroma_qp(qp, pps.cr_qp_offset)
    ly = decode_residual(d, 4, 0, 0, pps.sign_hide) if cbf_y else \
        np.zeros((16, 16), np.int32)
    lcb = decode_residual(d, 3, 1, 0, pps.sign_hide) if cbf_cb else \
        np.zeros((8, 8), np.int32)
    lcr = decode_residual(d, 3, 2, 0, pps.sign_hide) if cbf_cr else \
        np.zeros((8, 8), np.int32)
    modes[cy, cx] = mode

    if bypass:
        # transquant bypass: levels ARE the residual samples
        resi_y, resi_cb, resi_cr = ly, lcb, lcr
    else:
        resi_y = inv_transform_np(dequant_np(ly, qp)) if cbf_y else \
            np.zeros((16, 16), np.int32)
        resi_cb = inv_transform_np(dequant_np(lcb, qp_cb)) if cbf_cb \
            else np.zeros((8, 8), np.int32)
        resi_cr = inv_transform_np(dequant_np(lcr, qp_cr)) if cbf_cr \
            else np.zeros((8, 8), np.int32)

    avail_l = cx > 0
    avail_t = cy > 0
    avail_tr = cy > 0 and cx < wc - 1
    _intra_recon_block(y_pl, pad + cx * 16, pad + cy * 16, 16, mode, 0,
                       resi_y, avail_l, avail_t, avail_tr)
    hp = pad // 2
    _intra_recon_block(cb_pl, hp + cx * 8, hp + cy * 8, 8, mode, 1,
                       resi_cb, avail_l, avail_t, avail_tr)
    _intra_recon_block(cr_pl, hp + cx * 8, hp + cy * 8, 8, mode, 2,
                       resi_cr, avail_l, avail_t, avail_tr)


def _parse_intra_mode(d, mpms) -> int:
    """prev_intra_luma_pred_flag + mpm_idx / rem mode (spec 7.3.8.5)."""
    if d.decode_bin(S.CTX_PREV_INTRA):
        idx = 0
        if d.decode_bypass():
            idx = 1 + d.decode_bypass()
        return mpms[idx]
    rem = d.decode_bypass_bins(5)
    for m in sorted(mpms):
        if rem >= m:
            rem += 1
    return rem


def _decode_intra_cu(d, sps, pps, qpctx, bx, by, cells, w16, h16,
                     y_pl, cb_pl, cr_pl, modes16, pad):
    """One intra CU of `cells`*16 luma size at 16-cell (bx, by) inside
    a CTU32 quadtree (mirror of cabac.syntax.encode_intra_cu)."""
    n = cells * 16
    log2n = 4 + (cells - 1)
    if log2n == sps.log2_min_cb:
        assert d.decode_bin(S.CTX_PART_MODE) == 1, "PART_NxN unsupported"
    cand_a = int(modes16[by, bx - 1]) \
        if _zavail(bx, by, bx - 1, by, w16, h16) else 1
    # above candidate forced to DC outside the current CTU (spec 8.4.2)
    cand_b = int(modes16[by - 1, bx]) if (by % 2 == 1) else 1
    mode = _parse_intra_mode(d, mpm_list_dec(cand_a, cand_b))
    assert d.decode_bin(S.CTX_CHROMA_PRED) == 0, "non-DM chroma"
    cbf_cb = d.decode_bin(S.CTX_QT_CBF_CHROMA + 0)
    cbf_cr = d.decode_bin(S.CTX_QT_CBF_CHROMA + 0)
    cbf_y = d.decode_bin(S.CTX_QT_CBF_LUMA + 1)
    qp = _cu_qp_update(d, pps, qpctx, cbf_y or cbf_cb or cbf_cr)
    if "qp16" in qpctx:
        qpctx["qp16"][by:by + cells, bx:bx + cells] = qp
    qp_cb = chroma_qp(qp, pps.cb_qp_offset)
    qp_cr = chroma_qp(qp, pps.cr_qp_offset)
    nc = n // 2
    ly = decode_residual(d, log2n, 0, 0, pps.sign_hide) if cbf_y else \
        np.zeros((n, n), np.int32)
    lcb = decode_residual(d, log2n - 1, 1, 0, pps.sign_hide) if cbf_cb else \
        np.zeros((nc, nc), np.int32)
    lcr = decode_residual(d, log2n - 1, 2, 0, pps.sign_hide) if cbf_cr else \
        np.zeros((nc, nc), np.int32)
    modes16[by:by + cells, bx:bx + cells] = mode
    bd = sps.bit_depth
    resi_y = inv_transform_np(dequant_np(ly, qp, bd), bit_depth=bd) \
        if cbf_y else np.zeros((n, n), np.int32)
    resi_cb = inv_transform_np(dequant_np(lcb, qp_cb, bd),
                               bit_depth=bd) if cbf_cb else \
        np.zeros((nc, nc), np.int32)
    resi_cr = inv_transform_np(dequant_np(lcr, qp_cr, bd),
                               bit_depth=bd) if cbf_cr else \
        np.zeros((nc, nc), np.int32)
    at, al, ac = _zavail_masks(bx, by, cells, w16, h16, n)
    _intra_recon_block(y_pl, pad + bx * 16, pad + by * 16, n, mode, 0,
                       resi_y, al, at, avail_corner=ac, bit_depth=bd)
    hp = pad // 2
    _intra_recon_block(cb_pl, hp + bx * 8, hp + by * 8, nc, mode, 1,
                       resi_cb, al[::2], at[::2], avail_corner=ac,
                       bit_depth=bd)
    _intra_recon_block(cr_pl, hp + bx * 8, hp + by * 8, nc, mode, 2,
                       resi_cr, al[::2], at[::2], avail_corner=ac,
                       bit_depth=bd)


def _decode_ctu_tree(d, sps, pps, qpctx, cx, cy, wc32, hc32,
                     y_pl, cb_pl, cr_pl, modes16, split_map, pad):
    """CTU32 with depth-1 CU quadtree (spec 7.3.8.4 coding_quadtree)."""
    w16, h16 = wc32 * 2, hc32 * 2
    split = S.decode_split_cu(
        d, int(split_map[cy, cx - 1]) if cx > 0 else 0,
        int(split_map[cy - 1, cx]) if cy > 0 else 0, cx > 0, cy > 0)
    split_map[cy, cx] = split
    by, bx = 2 * cy, 2 * cx
    if split:
        for q in range(4):
            _decode_intra_cu(d, sps, pps, qpctx, bx + (q & 1),
                             by + (q >> 1), 1, w16, h16,
                             y_pl, cb_pl, cr_pl, modes16, pad)
    else:
        _decode_intra_cu(d, sps, pps, qpctx, bx, by, 2, w16, h16,
                         y_pl, cb_pl, cr_pl, modes16, pad)


# ---------------------------------------------------------------------------
# P-slice decoding (v1 inter feature set)
# ---------------------------------------------------------------------------

from ..models.mvpred import (MAX_MERGE, amvp_candidates_scalar,
                             merge_candidates_scalar, neighbor_state)
from ..ops.me_ref import mc_chroma_qpel_np, mc_luma_qpel_np


def _decode_mvd(d: CabacDecoder) -> tuple[int, int]:
    g0x = d.decode_bin(S.CTX_MVD)
    g0y = d.decode_bin(S.CTX_MVD)
    g1x = d.decode_bin(S.CTX_MVD + 1) if g0x else 0
    g1y = d.decode_bin(S.CTX_MVD + 1) if g0y else 0

    def read_rest(g0, g1):
        if not g0:
            return 0
        if not g1:
            v = 1
        else:
            # EG1
            k = 1
            v = 2
            while d.decode_bypass():
                v += 1 << k
                k += 1
            v += d.decode_bypass_bins(k)
        return -v if d.decode_bypass() else v
    mx = read_rest(g0x, g1x)
    my = read_rest(g0y, g1y)
    return mx, my


def _decode_ref_idx(d: CabacDecoder, num_ref: int) -> int:
    """ref_idx_lX TR parse (9.3.3.2, cMax = num_ref - 1): bins 0-1
    context-coded, rest bypass — mirror of syntax.encode_ref_idx."""
    if num_ref <= 1:
        return 0
    cmax = num_ref - 1
    idx = 0
    while idx < cmax:
        b = d.decode_bin(S.CTX_REF_IDX + idx) if idx < 2 \
            else d.decode_bypass()
        if not b:
            break
        idx += 1
    return idx


def _decode_merge_idx(d: CabacDecoder, max_merge: int) -> int:
    if max_merge <= 1:
        return 0
    if not d.decode_bin(S.CTX_MERGE_IDX):
        return 0
    idx = 1
    while idx < max_merge - 1 and d.decode_bypass():
        idx += 1
    return idx


def _decode_p_ctu16(d, pps, qpctx, cx, cy, wc, hc, y_pl, cb_pl,
                    cr_pl, ref, maps, pad):
    """Decode one P-slice CTU; maps: dict of per-CTU state arrays."""
    qp = qpctx["prev"]
    qp_cb = chroma_qp(qp, pps.cb_qp_offset)
    qp_cr = chroma_qp(qp, pps.cr_qp_offset)
    skip_l = int(maps["skip"][cy, cx - 1]) if cx > 0 else 0
    skip_a = int(maps["skip"][cy - 1, cx]) if cy > 0 else 0
    skip = d.decode_bin(S.CTX_CU_SKIP + skip_l + skip_a)
    ref_y, ref_cb, ref_cr = ref
    x0, y0 = cx * 16, cy * 16

    def inter_recon(mv_q, lv_y, lv_cb, lv_cr):
        py = mc_luma_qpel_np(ref_y, x0, y0, mv_q[0], mv_q[1], 16)
        pcb = mc_chroma_qpel_np(ref_cb, x0 // 2, y0 // 2, mv_q[0],
                                mv_q[1], 8)
        pcr = mc_chroma_qpel_np(ref_cr, x0 // 2, y0 // 2, mv_q[0],
                                mv_q[1], 8)
        ry = np.clip(py + (inv_transform_np(dequant_np(lv_y, qp))
                           if lv_y.any() else 0), 0, 255)
        rcb = np.clip(pcb + (inv_transform_np(dequant_np(lv_cb, qp_cb))
                             if lv_cb.any() else 0), 0, 255)
        rcr = np.clip(pcr + (inv_transform_np(dequant_np(lv_cr, qp_cr))
                             if lv_cr.any() else 0), 0, 255)
        y_pl[pad + y0:pad + y0 + 16, pad + x0:pad + x0 + 16] = ry
        hp = pad // 2
        cb_pl[hp + y0 // 2:hp + y0 // 2 + 8,
              hp + x0 // 2:hp + x0 // 2 + 8] = rcb
        cr_pl[hp + y0 // 2:hp + y0 // 2 + 8,
              hp + x0 // 2:hp + x0 // 2 + 8] = rcr

    z8 = np.zeros((8, 8), np.int32)
    z16 = np.zeros((16, 16), np.int32)
    if skip:
        midx = _decode_merge_idx(d, MAX_MERGE)
        nbs = neighbor_state(maps["inter"], maps["mv"], cx, cy, wc)
        cands = merge_candidates_scalar(*nbs)
        mv = cands[midx]
        inter_recon(mv, z16, z8, z8)
        maps["inter"][cy, cx] = 1
        maps["skip"][cy, cx] = 1
        maps["mv"][cy, cx] = mv
        maps["imode"][cy, cx] = -1
        maps["cbf"][cy, cx] = 0
        if "qp16" in qpctx:
            qpctx["qp16"][cy, cx] = qp
        return
    intra = d.decode_bin(S.CTX_PRED_MODE)
    assert d.decode_bin(S.CTX_PART_MODE) == 1, "PART_2Nx2N only"
    if intra:
        li = int(maps["imode"][cy, cx - 1]) if cx > 0 else -1
        mpms = mpm_list_dec(li if li >= 0 else 1, 1)
        if d.decode_bin(S.CTX_PREV_INTRA):
            idx = 0
            if d.decode_bypass():
                idx = 1 + d.decode_bypass()
            mode = mpms[idx]
        else:
            rem = d.decode_bypass_bins(5)
            for m in sorted(mpms):
                if rem >= m:
                    rem += 1
            mode = rem
        assert d.decode_bin(S.CTX_CHROMA_PRED) == 0
        cbf_cb = d.decode_bin(S.CTX_QT_CBF_CHROMA)
        cbf_cr = d.decode_bin(S.CTX_QT_CBF_CHROMA)
        cbf_y = d.decode_bin(S.CTX_QT_CBF_LUMA + 1)
        qp = _cu_qp_update(d, pps, qpctx, cbf_y or cbf_cb or cbf_cr)
        qp_cb = chroma_qp(qp, pps.cb_qp_offset)
        qp_cr = chroma_qp(qp, pps.cr_qp_offset)
        ly = decode_residual(d, 4, 0, 0, pps.sign_hide) if cbf_y else z16
        lcb = decode_residual(d, 3, 1, 0, pps.sign_hide) if cbf_cb else z8
        lcr = decode_residual(d, 3, 2, 0, pps.sign_hide) if cbf_cr else z8
        resi_y = inv_transform_np(dequant_np(ly, qp)) if cbf_y else z16
        resi_cb = inv_transform_np(dequant_np(lcb, qp_cb)) if cbf_cb \
            else z8
        resi_cr = inv_transform_np(dequant_np(lcr, qp_cr)) if cbf_cr \
            else z8
        avail_l, avail_t = cx > 0, cy > 0
        avail_tr = cy > 0 and cx < wc - 1
        _intra_recon_block(y_pl, pad + x0, pad + y0, 16, mode, 0,
                           resi_y, avail_l, avail_t, avail_tr)
        hp = pad // 2
        _intra_recon_block(cb_pl, hp + x0 // 2, hp + y0 // 2, 8, mode, 1,
                           resi_cb, avail_l, avail_t, avail_tr)
        _intra_recon_block(cr_pl, hp + x0 // 2, hp + y0 // 2, 8, mode, 2,
                           resi_cr, avail_l, avail_t, avail_tr)
        maps["inter"][cy, cx] = 0
        maps["skip"][cy, cx] = 0
        maps["mv"][cy, cx] = (0, 0)
        maps["imode"][cy, cx] = mode
        maps["cbf"][cy, cx] = int(bool(ly.any()))
        if "qp16" in qpctx:
            qpctx["qp16"][cy, cx] = qp
        return
    # AMVP inter
    assert d.decode_bin(S.CTX_MERGE_FLAG) == 0, \
        "non-skip merge unsupported in v1"
    mvd = _decode_mvd(d)
    mvp_idx = d.decode_bin(S.CTX_MVP)
    nbs = neighbor_state(maps["inter"], maps["mv"], cx, cy, wc)
    a1, b1, b0, b2 = nbs
    amvp = amvp_candidates_scalar(a1, b0, b1, b2)
    mv = (amvp[mvp_idx][0] + mvd[0], amvp[mvp_idx][1] + mvd[1])
    root = d.decode_bin(S.CTX_RQT_ROOT_CBF)
    ly, lcb, lcr = z16, z8, z8
    if root:
        cbf_cb = d.decode_bin(S.CTX_QT_CBF_CHROMA)
        cbf_cr = d.decode_bin(S.CTX_QT_CBF_CHROMA)
        cbf_y = d.decode_bin(S.CTX_QT_CBF_LUMA + 1) \
            if (cbf_cb or cbf_cr) else 1
        qp = _cu_qp_update(d, pps, qpctx, 1)
        qp_cb = chroma_qp(qp, pps.cb_qp_offset)
        qp_cr = chroma_qp(qp, pps.cr_qp_offset)
        ly = decode_residual(d, 4, 0, 0, pps.sign_hide) if cbf_y else z16
        lcb = decode_residual(d, 3, 1, 0, pps.sign_hide) if cbf_cb else z8
        lcr = decode_residual(d, 3, 2, 0, pps.sign_hide) if cbf_cr else z8
    inter_recon(mv, ly, lcb, lcr)
    maps["inter"][cy, cx] = 1
    maps["skip"][cy, cx] = 0
    maps["mv"][cy, cx] = mv
    maps["imode"][cy, cx] = -1
    maps["cbf"][cy, cx] = int(bool(ly.any()))
    if "qp16" in qpctx:
        qpctx["qp16"][cy, cx] = qp


def _decode_p_cu_tree(d, pps, qpctx, bx, by, cells, w16, h16,
                      y_pl, cb_pl, cr_pl, refctx, maps, pad):
    """One P-slice CU of cells*16 luma size at 16-cell (bx, by) inside
    a CTB32 quadtree (mirror of cabac.syntax.encode_cu_pb / native
    code_cu).  Motion/coding state lives on the 16-cell grid.
    refctx: dict(refs=[(y,cb,cr)...], ref_pocs, poc, num_ref) — the
    active L0 list (multi-ref, round 5)."""
    from ..models.mvpred import (amvp_candidates_ref_scalar,
                                 merge_candidates_ref_scalar,
                                 neighbor_state_tree_ref)
    qp = qpctx["prev"]
    qp_cb = chroma_qp(qp, pps.cb_qp_offset)
    qp_cr = chroma_qp(qp, pps.cr_qp_offset)
    skip_l = int(maps["skip"][by, bx - 1]) if bx > 0 else 0
    skip_a = int(maps["skip"][by - 1, bx]) if by > 0 else 0
    skip = d.decode_bin(S.CTX_CU_SKIP + skip_l + skip_a)
    num_ref = refctx["num_ref"]
    n = cells * 16
    log2n = 4 + (cells - 1)
    nc = n // 2
    x0, y0 = bx * 16, by * 16
    zn = np.zeros((n, n), np.int32)
    znc = np.zeros((nc, nc), np.int32)

    def set_cells(inter, skipf, mv, imode, cbf, qpv, refi=0):
        maps["inter"][by:by + cells, bx:bx + cells] = inter
        maps["skip"][by:by + cells, bx:bx + cells] = skipf
        maps["mv"][by:by + cells, bx:bx + cells] = mv
        maps["ref"][by:by + cells, bx:bx + cells] = refi
        maps["imode"][by:by + cells, bx:bx + cells] = imode
        maps["cbf"][by:by + cells, bx:bx + cells] = cbf
        if "qp16" in qpctx:
            qpctx["qp16"][by:by + cells, bx:bx + cells] = qpv

    def inter_recon(mv_q, lv_y, lv_cb, lv_cr, qpv, refi=0):
        ref_y, ref_cb, ref_cr = refctx["refs"][refi]
        qcb = chroma_qp(qpv, pps.cb_qp_offset)
        qcr = chroma_qp(qpv, pps.cr_qp_offset)
        py = mc_luma_qpel_np(ref_y, x0, y0, mv_q[0], mv_q[1], n)
        pcb = mc_chroma_qpel_np(ref_cb, x0 // 2, y0 // 2, mv_q[0],
                                mv_q[1], nc)
        pcr = mc_chroma_qpel_np(ref_cr, x0 // 2, y0 // 2, mv_q[0],
                                mv_q[1], nc)
        ry = np.clip(py + (inv_transform_np(dequant_np(lv_y, qpv))
                           if lv_y.any() else 0), 0, 255)
        rcb = np.clip(pcb + (inv_transform_np(dequant_np(lv_cb, qcb))
                             if lv_cb.any() else 0), 0, 255)
        rcr = np.clip(pcr + (inv_transform_np(dequant_np(lv_cr, qcr))
                             if lv_cr.any() else 0), 0, 255)
        y_pl[pad + y0:pad + y0 + n, pad + x0:pad + x0 + n] = ry
        hp = pad // 2
        cb_pl[hp + y0 // 2:hp + y0 // 2 + nc,
              hp + x0 // 2:hp + x0 // 2 + nc] = rcb
        cr_pl[hp + y0 // 2:hp + y0 // 2 + nc,
              hp + x0 // 2:hp + x0 // 2 + nc] = rcr

    nbs = neighbor_state_tree_ref(maps["inter"], maps["mv"],
                                  maps["ref"], bx, by, cells, w16,
                                  h16, _zavail)
    a1, b1, b0, b2 = nbs
    if skip:
        midx = _decode_merge_idx(d, MAX_MERGE)
        cands = merge_candidates_ref_scalar(a1, b1, b0, b2)
        mvx, mvy, refi = cands[midx]
        inter_recon((mvx, mvy), zn, znc, znc, qp, refi)
        set_cells(1, 1, (mvx, mvy), -1, 0, qp, refi)
        return
    intra = d.decode_bin(S.CTX_PRED_MODE)
    if not intra or cells == 1:
        assert d.decode_bin(S.CTX_PART_MODE) == 1, "PART_2Nx2N only"
    if intra:
        li = int(maps["imode"][by, bx - 1]) if bx > 0 else -1
        cand_a = li if li >= 0 else 1
        # above candidate forced to DC outside the current CTB (8.4.2)
        ai = int(maps["imode"][by - 1, bx]) if (by % 2 == 1) else -1
        cand_b = ai if ai >= 0 else 1
        mode = _parse_intra_mode(d, mpm_list_dec(cand_a, cand_b))
        assert d.decode_bin(S.CTX_CHROMA_PRED) == 0, "non-DM chroma"
        cbf_cb = d.decode_bin(S.CTX_QT_CBF_CHROMA)
        cbf_cr = d.decode_bin(S.CTX_QT_CBF_CHROMA)
        cbf_y = d.decode_bin(S.CTX_QT_CBF_LUMA + 1)
        qp = _cu_qp_update(d, pps, qpctx, cbf_y or cbf_cb or cbf_cr)
        qp_cb = chroma_qp(qp, pps.cb_qp_offset)
        qp_cr = chroma_qp(qp, pps.cr_qp_offset)
        ly = decode_residual(d, log2n, 0, 0, pps.sign_hide) if cbf_y else zn
        lcb = decode_residual(d, log2n - 1, 1, 0, pps.sign_hide) if cbf_cb else znc
        lcr = decode_residual(d, log2n - 1, 2, 0, pps.sign_hide) if cbf_cr else znc
        resi_y = inv_transform_np(dequant_np(ly, qp)) if cbf_y else zn
        resi_cb = inv_transform_np(dequant_np(lcb, qp_cb)) if cbf_cb \
            else znc
        resi_cr = inv_transform_np(dequant_np(lcr, qp_cr)) if cbf_cr \
            else znc
        at, al, ac = _zavail_masks(bx, by, cells, w16, h16, n)
        _intra_recon_block(y_pl, pad + x0, pad + y0, n, mode, 0,
                           resi_y, al, at, avail_corner=ac)
        hp = pad // 2
        _intra_recon_block(cb_pl, hp + x0 // 2, hp + y0 // 2, nc, mode,
                           1, resi_cb, al[::2], at[::2],
                           avail_corner=ac)
        _intra_recon_block(cr_pl, hp + x0 // 2, hp + y0 // 2, nc, mode,
                           2, resi_cr, al[::2], at[::2],
                           avail_corner=ac)
        set_cells(0, 0, (0, 0), mode, int(bool(ly.any())), qp)
        return
    # AMVP inter
    assert d.decode_bin(S.CTX_MERGE_FLAG) == 0, \
        "non-skip merge unsupported"
    refi = _decode_ref_idx(d, num_ref)
    mvd = _decode_mvd(d)
    mvp_idx = d.decode_bin(S.CTX_MVP)
    amvp = amvp_candidates_ref_scalar(a1, b0, b1, b2, refi,
                                      refctx["poc"],
                                      refctx["ref_pocs"])
    mv = (amvp[mvp_idx][0] + mvd[0], amvp[mvp_idx][1] + mvd[1])
    root = d.decode_bin(S.CTX_RQT_ROOT_CBF)
    ly, lcb, lcr = zn, znc, znc
    if root:
        cbf_cb = d.decode_bin(S.CTX_QT_CBF_CHROMA)
        cbf_cr = d.decode_bin(S.CTX_QT_CBF_CHROMA)
        cbf_y = d.decode_bin(S.CTX_QT_CBF_LUMA + 1) \
            if (cbf_cb or cbf_cr) else 1
        qp = _cu_qp_update(d, pps, qpctx, 1)
        ly = decode_residual(d, log2n, 0, 0, pps.sign_hide) if cbf_y else zn
        lcb = decode_residual(d, log2n - 1, 1, 0, pps.sign_hide) if cbf_cb else znc
        lcr = decode_residual(d, log2n - 1, 2, 0, pps.sign_hide) if cbf_cr else znc
    inter_recon(mv, ly, lcb, lcr, qp, refi)
    set_cells(1, 0, mv, -1, int(bool(ly.any())), qp, refi)


def _decode_ctu_ptree(d, pps, qpctx, cx, cy, wc32, hc32, y_pl, cb_pl,
                      cr_pl, refctx, maps, split_map, pad):
    """P-slice CTU32 with depth-1 CU quadtree (spec 7.3.8.4)."""
    w16, h16 = wc32 * 2, hc32 * 2
    split = S.decode_split_cu(
        d, int(split_map[cy, cx - 1]) if cx > 0 else 0,
        int(split_map[cy - 1, cx]) if cy > 0 else 0, cx > 0, cy > 0)
    split_map[cy, cx] = split
    by, bx = 2 * cy, 2 * cx
    if split:
        for q in range(4):
            _decode_p_cu_tree(d, pps, qpctx, bx + (q & 1),
                              by + (q >> 1), 1, w16, h16,
                              y_pl, cb_pl, cr_pl, refctx, maps, pad)
    else:
        _decode_p_cu_tree(d, pps, qpctx, bx, by, 2, w16, h16,
                          y_pl, cb_pl, cr_pl, refctx, maps, pad)


def _decode_b_cu_tree(d, pps, qpctx, bx, by, cells, w16, h16,
                      y_pl, cb_pl, cr_pl, ref0, ref1, dsf0, dsf1,
                      maps, pad, ct_depth):
    """One B-slice CU of cells*16 luma size at 16-cell (bx, by) inside
    a CTB32 quadtree (mirror of cabac.syntax.encode_cu_pb st=B)."""
    from ..models.mvpred import (amvp_candidates_b_scalar,
                                 merge_candidates_b_scalar,
                                 neighbor_state_tree_b)
    from ..ops.me_ref import (bi_combine_np, mc_chroma_qpel14_np,
                              mc_luma_qpel14_np)
    qp = qpctx["prev"]
    skip_l = int(maps["skip"][by, bx - 1]) if bx > 0 else 0
    skip_a = int(maps["skip"][by - 1, bx]) if by > 0 else 0
    skip = d.decode_bin(S.CTX_CU_SKIP + skip_l + skip_a)
    r0y, r0cb, r0cr = ref0
    r1y, r1cb, r1cr = ref1
    n = cells * 16
    log2n = 4 + (cells - 1)
    nc = n // 2
    x0, y0 = bx * 16, by * 16
    zn = np.zeros((n, n), np.int32)
    znc = np.zeros((nc, nc), np.int32)

    def set_cells(dirv, mv0, mv1, skipf, imode, cbf, qpv):
        maps["dir"][by:by + cells, bx:bx + cells] = dirv
        maps["mv0"][by:by + cells, bx:bx + cells] = \
            mv0 if (dirv & 1) else (0, 0)
        maps["mv1"][by:by + cells, bx:bx + cells] = \
            mv1 if (dirv & 2) else (0, 0)
        maps["skip"][by:by + cells, bx:bx + cells] = skipf
        maps["imode"][by:by + cells, bx:bx + cells] = imode
        maps["cbf"][by:by + cells, bx:bx + cells] = cbf
        if "qp16" in qpctx:
            qpctx["qp16"][by:by + cells, bx:bx + cells] = qpv

    def mc_plane(refa, refb, dirv, mv0, mv1, px, py, bn, luma):
        mc = mc_luma_qpel14_np if luma else mc_chroma_qpel14_np
        if dirv == 3:
            p0 = mc(refa, px, py, mv0[0], mv0[1], bn)
            p1 = mc(refb, px, py, mv1[0], mv1[1], bn)
            return bi_combine_np(p0, p1)
        mv = mv0 if dirv == 1 else mv1
        ref = refa if dirv == 1 else refb
        p14 = mc(ref, px, py, mv[0], mv[1], bn)
        return np.clip((p14 + 32) >> 6, 0, 255).astype(np.int32)

    def inter_recon(dirv, mv0, mv1, lv_y, lv_cb, lv_cr, qpv):
        qcb = chroma_qp(qpv, pps.cb_qp_offset)
        qcr = chroma_qp(qpv, pps.cr_qp_offset)
        py = mc_plane(r0y, r1y, dirv, mv0, mv1, x0, y0, n, True)
        pcb = mc_plane(r0cb, r1cb, dirv, mv0, mv1, x0 // 2, y0 // 2,
                       nc, False)
        pcr = mc_plane(r0cr, r1cr, dirv, mv0, mv1, x0 // 2, y0 // 2,
                       nc, False)
        ry = np.clip(py + (inv_transform_np(dequant_np(lv_y, qpv))
                           if lv_y.any() else 0), 0, 255)
        rcb = np.clip(pcb + (inv_transform_np(dequant_np(lv_cb, qcb))
                             if lv_cb.any() else 0), 0, 255)
        rcr = np.clip(pcr + (inv_transform_np(dequant_np(lv_cr, qcr))
                             if lv_cr.any() else 0), 0, 255)
        y_pl[pad + y0:pad + y0 + n, pad + x0:pad + x0 + n] = ry
        hp = pad // 2
        cb_pl[hp + y0 // 2:hp + y0 // 2 + nc,
              hp + x0 // 2:hp + x0 // 2 + nc] = rcb
        cr_pl[hp + y0 // 2:hp + y0 // 2 + nc,
              hp + x0 // 2:hp + x0 // 2 + nc] = rcr

    nbs = neighbor_state_tree_b(maps["dir"], maps["mv0"], maps["mv1"],
                                bx, by, cells, w16, h16, _zavail)
    a1, b1, b0, b2 = nbs
    if skip:
        midx = _decode_merge_idx(d, MAX_MERGE)
        cands = merge_candidates_b_scalar(a1, b1, b0, b2, MAX_MERGE)
        dirv, mv0, mv1 = cands[midx]
        inter_recon(dirv, mv0, mv1, zn, znc, znc, qp)
        set_cells(dirv, mv0, mv1, 1, -1, 0, qp)
        return
    intra = d.decode_bin(S.CTX_PRED_MODE)
    if not intra or cells == 1:
        assert d.decode_bin(S.CTX_PART_MODE) == 1, "PART_2Nx2N only"
    if intra:
        li = int(maps["imode"][by, bx - 1]) if bx > 0 else -1
        cand_a = li if li >= 0 else 1
        ai = int(maps["imode"][by - 1, bx]) if (by % 2 == 1) else -1
        cand_b = ai if ai >= 0 else 1
        mode = _parse_intra_mode(d, mpm_list_dec(cand_a, cand_b))
        assert d.decode_bin(S.CTX_CHROMA_PRED) == 0, "non-DM chroma"
        cbf_cb = d.decode_bin(S.CTX_QT_CBF_CHROMA)
        cbf_cr = d.decode_bin(S.CTX_QT_CBF_CHROMA)
        cbf_y = d.decode_bin(S.CTX_QT_CBF_LUMA + 1)
        qp = _cu_qp_update(d, pps, qpctx, cbf_y or cbf_cb or cbf_cr)
        qp_cb = chroma_qp(qp, pps.cb_qp_offset)
        qp_cr = chroma_qp(qp, pps.cr_qp_offset)
        ly = decode_residual(d, log2n, 0, 0, pps.sign_hide) if cbf_y else zn
        lcb = decode_residual(d, log2n - 1, 1, 0, pps.sign_hide) if cbf_cb else znc
        lcr = decode_residual(d, log2n - 1, 2, 0, pps.sign_hide) if cbf_cr else znc
        resi_y = inv_transform_np(dequant_np(ly, qp)) if cbf_y else zn
        resi_cb = inv_transform_np(dequant_np(lcb, qp_cb)) if cbf_cb \
            else znc
        resi_cr = inv_transform_np(dequant_np(lcr, qp_cr)) if cbf_cr \
            else znc
        at, al, ac = _zavail_masks(bx, by, cells, w16, h16, n)
        _intra_recon_block(y_pl, pad + x0, pad + y0, n, mode, 0,
                           resi_y, al, at, avail_corner=ac)
        hp = pad // 2
        _intra_recon_block(cb_pl, hp + x0 // 2, hp + y0 // 2, nc, mode,
                           1, resi_cb, al[::2], at[::2],
                           avail_corner=ac)
        _intra_recon_block(cr_pl, hp + x0 // 2, hp + y0 // 2, nc, mode,
                           2, resi_cr, al[::2], at[::2],
                           avail_corner=ac)
        set_cells(0, (0, 0), (0, 0), 0, mode, int(bool(ly.any())), qp)
        return
    assert d.decode_bin(S.CTX_MERGE_FLAG) == 0, \
        "non-skip merge unsupported"
    # inter_pred_idc (9.3.4.2.2: bin0 ctx CtDepth; bin1 ctx 4)
    if d.decode_bin(S.CTX_INTER_DIR + ct_depth):
        dirv = 3
    else:
        dirv = 2 if d.decode_bin(S.CTX_INTER_DIR + 4) else 1
    mv0 = mv1 = (0, 0)
    if dirv != 2:
        mvd0 = _decode_mvd(d)
        mvp0 = d.decode_bin(S.CTX_MVP)
        amvp = amvp_candidates_b_scalar(a1, b1, b0, b2, 0, dsf0)
        mv0 = (amvp[mvp0][0] + mvd0[0], amvp[mvp0][1] + mvd0[1])
    if dirv != 1:
        mvd1 = _decode_mvd(d)
        mvp1 = d.decode_bin(S.CTX_MVP)
        amvp = amvp_candidates_b_scalar(a1, b1, b0, b2, 1, dsf1)
        mv1 = (amvp[mvp1][0] + mvd1[0], amvp[mvp1][1] + mvd1[1])
    root = d.decode_bin(S.CTX_RQT_ROOT_CBF)
    ly, lcb, lcr = zn, znc, znc
    if root:
        cbf_cb = d.decode_bin(S.CTX_QT_CBF_CHROMA)
        cbf_cr = d.decode_bin(S.CTX_QT_CBF_CHROMA)
        cbf_y = d.decode_bin(S.CTX_QT_CBF_LUMA + 1) \
            if (cbf_cb or cbf_cr) else 1
        qp = _cu_qp_update(d, pps, qpctx, 1)
        ly = decode_residual(d, log2n, 0, 0, pps.sign_hide) if cbf_y else zn
        lcb = decode_residual(d, log2n - 1, 1, 0, pps.sign_hide) if cbf_cb else znc
        lcr = decode_residual(d, log2n - 1, 2, 0, pps.sign_hide) if cbf_cr else znc
    inter_recon(dirv, mv0, mv1, ly, lcb, lcr, qp)
    set_cells(dirv, mv0, mv1, 0, -1, int(bool(ly.any())), qp)


def _decode_ctu_btree(d, pps, qpctx, cx, cy, wc32, hc32, y_pl, cb_pl,
                      cr_pl, ref0, ref1, dsf0, dsf1, maps, split_map,
                      pad):
    """B-slice CTU32 with depth-1 CU quadtree (spec 7.3.8.4)."""
    w16, h16 = wc32 * 2, hc32 * 2
    split = S.decode_split_cu(
        d, int(split_map[cy, cx - 1]) if cx > 0 else 0,
        int(split_map[cy - 1, cx]) if cy > 0 else 0, cx > 0, cy > 0)
    split_map[cy, cx] = split
    by, bx = 2 * cy, 2 * cx
    if split:
        for q in range(4):
            _decode_b_cu_tree(d, pps, qpctx, bx + (q & 1),
                              by + (q >> 1), 1, w16, h16, y_pl, cb_pl,
                              cr_pl, ref0, ref1, dsf0, dsf1, maps,
                              pad, 1)
    else:
        _decode_b_cu_tree(d, pps, qpctx, bx, by, 2, w16, h16, y_pl,
                          cb_pl, cr_pl, ref0, ref1, dsf0, dsf1, maps,
                          pad, 0)


def _decode_b_ctu16(d, pps, qpctx, cx, cy, wc, hc, y_pl, cb_pl,
                    cr_pl, ref0, ref1, dsf0, dsf1, maps, pad):
    """Decode one B-slice CTU; maps carry dir/mv0/mv1 motion state."""
    qp = qpctx["prev"]
    qp_cb = chroma_qp(qp, pps.cb_qp_offset)
    qp_cr = chroma_qp(qp, pps.cr_qp_offset)
    from ..models.mvpred import (amvp_candidates_b_scalar,
                                 merge_candidates_b_scalar,
                                 neighbor_state_b)
    from ..ops.me_ref import (bi_combine_np, mc_chroma_qpel14_np,
                              mc_luma_qpel14_np)
    skip_l = int(maps["skip"][cy, cx - 1]) if cx > 0 else 0
    skip_a = int(maps["skip"][cy - 1, cx]) if cy > 0 else 0
    skip = d.decode_bin(S.CTX_CU_SKIP + skip_l + skip_a)
    r0y, r0cb, r0cr = ref0
    r1y, r1cb, r1cr = ref1
    x0, y0 = cx * 16, cy * 16

    def mc_plane(refa, refb, dirv, mv0, mv1, px, py, n, luma):
        mc = mc_luma_qpel14_np if luma else mc_chroma_qpel14_np
        if dirv == 3:
            p0 = mc(refa, px, py, mv0[0], mv0[1], n)
            p1 = mc(refb, px, py, mv1[0], mv1[1], n)
            return bi_combine_np(p0, p1)
        mv = mv0 if dirv == 1 else mv1
        ref = refa if dirv == 1 else refb
        p14 = mc(ref, px, py, mv[0], mv[1], n)
        return np.clip((p14 + 32) >> 6, 0, 255).astype(np.int32)

    def inter_recon(dirv, mv0, mv1, lv_y, lv_cb, lv_cr):
        py = mc_plane(r0y, r1y, dirv, mv0, mv1, x0, y0, 16, True)
        pcb = mc_plane(r0cb, r1cb, dirv, mv0, mv1, x0 // 2, y0 // 2, 8,
                       False)
        pcr = mc_plane(r0cr, r1cr, dirv, mv0, mv1, x0 // 2, y0 // 2, 8,
                       False)
        ry = np.clip(py + (inv_transform_np(dequant_np(lv_y, qp))
                           if lv_y.any() else 0), 0, 255)
        rcb = np.clip(pcb + (inv_transform_np(dequant_np(lv_cb, qp_cb))
                             if lv_cb.any() else 0), 0, 255)
        rcr = np.clip(pcr + (inv_transform_np(dequant_np(lv_cr, qp_cr))
                             if lv_cr.any() else 0), 0, 255)
        y_pl[pad + y0:pad + y0 + 16, pad + x0:pad + x0 + 16] = ry
        hp = pad // 2
        cb_pl[hp + y0 // 2:hp + y0 // 2 + 8,
              hp + x0 // 2:hp + x0 // 2 + 8] = rcb
        cr_pl[hp + y0 // 2:hp + y0 // 2 + 8,
              hp + x0 // 2:hp + x0 // 2 + 8] = rcr

    def set_motion(dirv, mv0, mv1, is_skip, cbf=0):
        maps["dir"][cy, cx] = dirv
        maps["mv0"][cy, cx] = mv0 if (dirv & 1) else (0, 0)
        maps["mv1"][cy, cx] = mv1 if (dirv & 2) else (0, 0)
        maps["skip"][cy, cx] = is_skip
        maps["imode"][cy, cx] = -1
        maps["cbf"][cy, cx] = cbf

    z8 = np.zeros((8, 8), np.int32)
    z16 = np.zeros((16, 16), np.int32)
    nbs = neighbor_state_b(maps["dir"], maps["mv0"], maps["mv1"],
                           cx, cy, wc)
    a1, b1, b0, b2 = nbs
    if skip:
        midx = _decode_merge_idx(d, MAX_MERGE)
        cands = merge_candidates_b_scalar(a1, b1, b0, b2, MAX_MERGE)
        dirv, mv0, mv1 = cands[midx]
        inter_recon(dirv, mv0, mv1, z16, z8, z8)
        set_motion(dirv, mv0, mv1, 1)
        if "qp16" in qpctx:
            qpctx["qp16"][cy, cx] = qp
        return
    intra = d.decode_bin(S.CTX_PRED_MODE)
    assert d.decode_bin(S.CTX_PART_MODE) == 1, "PART_2Nx2N only"
    if intra:
        li = int(maps["imode"][cy, cx - 1]) if cx > 0 else -1
        mpms = mpm_list_dec(li if li >= 0 else 1, 1)
        if d.decode_bin(S.CTX_PREV_INTRA):
            idx = 0
            if d.decode_bypass():
                idx = 1 + d.decode_bypass()
            mode = mpms[idx]
        else:
            rem = d.decode_bypass_bins(5)
            for m in sorted(mpms):
                if rem >= m:
                    rem += 1
            mode = rem
        assert d.decode_bin(S.CTX_CHROMA_PRED) == 0
        cbf_cb = d.decode_bin(S.CTX_QT_CBF_CHROMA)
        cbf_cr = d.decode_bin(S.CTX_QT_CBF_CHROMA)
        cbf_y = d.decode_bin(S.CTX_QT_CBF_LUMA + 1)
        qp = _cu_qp_update(d, pps, qpctx, cbf_y or cbf_cb or cbf_cr)
        qp_cb = chroma_qp(qp, pps.cb_qp_offset)
        qp_cr = chroma_qp(qp, pps.cr_qp_offset)
        ly = decode_residual(d, 4, 0, 0, pps.sign_hide) if cbf_y else z16
        lcb = decode_residual(d, 3, 1, 0, pps.sign_hide) if cbf_cb else z8
        lcr = decode_residual(d, 3, 2, 0, pps.sign_hide) if cbf_cr else z8
        resi_y = inv_transform_np(dequant_np(ly, qp)) if cbf_y else z16
        resi_cb = inv_transform_np(dequant_np(lcb, qp_cb)) if cbf_cb \
            else z8
        resi_cr = inv_transform_np(dequant_np(lcr, qp_cr)) if cbf_cr \
            else z8
        avail_l, avail_t = cx > 0, cy > 0
        avail_tr = cy > 0 and cx < wc - 1
        _intra_recon_block(y_pl, pad + x0, pad + y0, 16, mode, 0,
                           resi_y, avail_l, avail_t, avail_tr)
        hp = pad // 2
        _intra_recon_block(cb_pl, hp + x0 // 2, hp + y0 // 2, 8, mode, 1,
                           resi_cb, avail_l, avail_t, avail_tr)
        _intra_recon_block(cr_pl, hp + x0 // 2, hp + y0 // 2, 8, mode, 2,
                           resi_cr, avail_l, avail_t, avail_tr)
        maps["dir"][cy, cx] = 0
        maps["mv0"][cy, cx] = (0, 0)
        maps["mv1"][cy, cx] = (0, 0)
        maps["skip"][cy, cx] = 0
        maps["imode"][cy, cx] = mode
        maps["cbf"][cy, cx] = int(bool(ly.any()))
        if "qp16" in qpctx:
            qpctx["qp16"][cy, cx] = qp
        return
    assert d.decode_bin(S.CTX_MERGE_FLAG) == 0, \
        "non-skip merge unsupported in v1"
    # inter_pred_idc (9.3.4.2.2: bin0 ctx CtDepth=0; bin1 ctx 4)
    if d.decode_bin(S.CTX_INTER_DIR + 0):
        dirv = 3
    else:
        dirv = 2 if d.decode_bin(S.CTX_INTER_DIR + 4) else 1
    mv0 = mv1 = (0, 0)
    if dirv != 2:
        mvd0 = _decode_mvd(d)
        mvp0 = d.decode_bin(S.CTX_MVP)
        amvp = amvp_candidates_b_scalar(a1, b1, b0, b2, 0, dsf0)
        mv0 = (amvp[mvp0][0] + mvd0[0], amvp[mvp0][1] + mvd0[1])
    if dirv != 1:
        mvd1 = _decode_mvd(d)
        mvp1 = d.decode_bin(S.CTX_MVP)
        amvp = amvp_candidates_b_scalar(a1, b1, b0, b2, 1, dsf1)
        mv1 = (amvp[mvp1][0] + mvd1[0], amvp[mvp1][1] + mvd1[1])
    root = d.decode_bin(S.CTX_RQT_ROOT_CBF)
    ly, lcb, lcr = z16, z8, z8
    if root:
        cbf_cb = d.decode_bin(S.CTX_QT_CBF_CHROMA)
        cbf_cr = d.decode_bin(S.CTX_QT_CBF_CHROMA)
        cbf_y = d.decode_bin(S.CTX_QT_CBF_LUMA + 1) \
            if (cbf_cb or cbf_cr) else 1
        qp = _cu_qp_update(d, pps, qpctx, 1)
        qp_cb = chroma_qp(qp, pps.cb_qp_offset)
        qp_cr = chroma_qp(qp, pps.cr_qp_offset)
        ly = decode_residual(d, 4, 0, 0, pps.sign_hide) if cbf_y else z16
        lcb = decode_residual(d, 3, 1, 0, pps.sign_hide) if cbf_cb else z8
        lcr = decode_residual(d, 3, 2, 0, pps.sign_hide) if cbf_cr else z8
    inter_recon(dirv, mv0, mv1, ly, lcb, lcr)
    set_motion(dirv, mv0, mv1, 0, int(bool(ly.any())))
    if "qp16" in qpctx:
        qpctx["qp16"][cy, cx] = qp


def _decode_inter_frame(rbsp: bytes, sps: DecSps, pps: DecPps,
                        dpb: dict[int, DecodedFrame]) -> DecodedFrame:
    """Decode a P or B slice using the POC-keyed DPB; prunes the DPB to
    the parsed RPS (spec 8.3.2 behavior for short-term sets)."""
    assert sps.bit_depth == 8, "10-bit is wired for all-intra (v1)"
    from ..models.mvpred import dist_scale_factor
    r = BitReader(rbsp)
    assert r.read_flag() == 1
    assert r.read_ue() == 0
    st = r.read_ue()
    assert st in (0, 1), "expected inter slice"
    poc = r.read(8)   # log2_max_poc_lsb = 8 in this pipeline
    assert r.read_flag() == 0          # st_rps_sps_flag (inline RPS)
    num_neg = r.read_ue()
    num_pos = r.read_ue()
    neg = []                           # (poc_ref, used)
    prev = 0
    for _ in range(num_neg):
        dist = prev + r.read_ue() + 1
        prev = dist
        neg.append((poc - dist, r.read_flag()))
    pos = []
    prev = 0
    for _ in range(num_pos):
        dist = prev + r.read_ue() + 1
        prev = dist
        pos.append((poc + dist, r.read_flag()))
    retained = {p for p, _ in neg} | {p for p, _ in pos}
    for p in retained:
        assert p in dpb, f"RPS references poc {p} not in DPB"
    stale = [p for p in dpb if p not in retained]
    for p in stale:
        del dpb[p]
    sao_luma = sao_chroma = 0
    if sps.sao:
        sao_luma = r.read_flag()
        sao_chroma = r.read_flag()
    num_ref0 = 1
    if r.read_flag():                  # num_ref_idx_active_override
        num_ref0 = r.read_ue() + 1
        if st == 0:
            assert r.read_ue() == 0    # num_ref_idx_l1_active_minus1
    if st == 0:
        assert r.read_flag() == 0      # mvd_l1_zero_flag
    five_minus = r.read_ue()
    max_merge = 5 - five_minus
    qp = pps.init_qp + r.read_se()
    entry = _parse_entry_points(r, pps)
    assert r.read_flag() == 1
    r.byte_align()
    payload = rbsp[r.bit_pos // 8:]

    # reference list construction (spec 8.3.4, 1 active ref per list):
    # L0[0] = nearest used past picture; L1[0] = nearest used future
    used_neg = sorted((p for p, u in neg if u), reverse=True)
    used_pos = sorted(p for p, u in pos if u)
    assert used_neg, "inter slice without a used past reference"
    ref0_poc = used_neg[0]
    ref0 = dpb[ref0_poc]
    ref0_pl = (ref0.full_y, ref0.full_cb, ref0.full_cr)
    # multi-ref L0: nearest-first, cyclic-filled to the active count
    l0_pocs = [used_neg[i % len(used_neg)] for i in range(num_ref0)]
    l0_pl = [(dpb[q].full_y, dpb[q].full_cb, dpb[q].full_cr)
             for q in l0_pocs]

    ctb = 1 << sps.log2_ctb
    wc = -(-sps.width // 16)
    hc = -(-sps.height // 16)
    pad = 16
    y_pl = np.zeros((hc * 16 + 2 * pad, wc * 16 + 2 * pad), dtype=np.int32)
    cb_pl = np.zeros((hc * 8 + pad, wc * 8 + pad), dtype=np.int32)
    cr_pl = np.zeros_like(cb_pl)
    qp_cb = chroma_qp(qp, pps.cb_qp_offset)
    qp_cr = chroma_qp(qp, pps.cr_qp_offset)
    assert max_merge == MAX_MERGE
    split_map = None

    if st == 1 and ctb == 32:
        # CTB32 depth-1 CU quadtree P slice: state on the 16-cell grid
        wc32, hc32 = -(-sps.width // 32), -(-sps.height // 32)
        maps = {
            "inter": np.zeros((hc, wc), np.int32),
            "skip": np.zeros((hc, wc), np.int32),
            "mv": np.zeros((hc, wc, 2), np.int32),
            "ref": np.zeros((hc, wc), np.int32),
            "imode": np.full((hc, wc), -1, np.int32),
            "cbf": np.zeros((hc, wc), np.int32),
        }
        split_map = np.zeros((hc32, wc32), np.int32)
        qpctx = {"prev": qp,
                 "qp16": np.full((hc, wc), qp, np.int32)}
        sao = _SaoState(hc32, wc32, bool(sao_luma), bool(sao_chroma)) \
            if (sao_luma or sao_chroma) else None
        refctx = dict(refs=l0_pl, ref_pocs=l0_pocs, poc=poc,
                      num_ref=num_ref0)

        def ctu_fn(d, cx, cy):
            _decode_ctu_ptree(d, pps, qpctx, cx, cy, wc32, hc32,
                              y_pl, cb_pl, cr_pl, refctx, maps,
                              split_map, pad)
        _slice_ctu_loop(payload, "P", qp, hc32, wc32, entry, qpctx,
                        sao, ctu_fn)
    elif st == 1:
        maps = {
            "inter": np.zeros((hc, wc), np.int32),
            "skip": np.zeros((hc, wc), np.int32),
            "mv": np.zeros((hc, wc, 2), np.int32),
            "imode": np.full((hc, wc), -1, np.int32),
            "cbf": np.zeros((hc, wc), np.int32),
        }
        qpctx = {"prev": qp,
                 "qp16": np.full((hc, wc), qp, np.int32)}
        sao = _SaoState(hc, wc, bool(sao_luma), bool(sao_chroma)) \
            if (sao_luma or sao_chroma) else None

        assert num_ref0 == 1, "flat CTU16 P path is single-ref"

        def ctu_fn(d, cx, cy):
            _decode_p_ctu16(d, pps, qpctx, cx, cy, wc, hc,
                            y_pl, cb_pl, cr_pl, ref0_pl, maps, pad)
        _slice_ctu_loop(payload, "P", qp, hc, wc, entry, qpctx, sao,
                        ctu_fn)
    else:
        assert used_pos, "B slice without a used future reference"
        ref1_poc = used_pos[0]
        ref1 = dpb[ref1_poc]
        ref1_pl = (ref1.full_y, ref1.full_cb, ref1.full_cr)
        dsf0 = dist_scale_factor(poc, ref0_poc, ref1_poc)
        dsf1 = dist_scale_factor(poc, ref1_poc, ref0_poc)
        maps = {
            "dir": np.zeros((hc, wc), np.int32),
            "skip": np.zeros((hc, wc), np.int32),
            "mv0": np.zeros((hc, wc, 2), np.int32),
            "mv1": np.zeros((hc, wc, 2), np.int32),
            "imode": np.full((hc, wc), -1, np.int32),
            "cbf": np.zeros((hc, wc), np.int32),
        }
        qpctx = {"prev": qp,
                 "qp16": np.full((hc, wc), qp, np.int32)}
        if ctb == 32:
            wc32, hc32 = -(-sps.width // 32), -(-sps.height // 32)
            split_map = np.zeros((hc32, wc32), np.int32)
            sao = _SaoState(hc32, wc32, bool(sao_luma),
                            bool(sao_chroma)) \
                if (sao_luma or sao_chroma) else None

            def ctu_fn(d, cx, cy):
                _decode_ctu_btree(d, pps, qpctx, cx, cy, wc32, hc32,
                                  y_pl, cb_pl, cr_pl, ref0_pl, ref1_pl,
                                  dsf0, dsf1, maps, split_map, pad)
            _slice_ctu_loop(payload, "B", qp, hc32, wc32, entry,
                            qpctx, sao, ctu_fn)
        else:
            sao = _SaoState(hc, wc, bool(sao_luma), bool(sao_chroma)) \
                if (sao_luma or sao_chroma) else None

            def ctu_fn(d, cx, cy):
                _decode_b_ctu16(d, pps, qpctx, cx, cy, wc, hc,
                                y_pl, cb_pl, cr_pl, ref0_pl, ref1_pl,
                                dsf0, dsf1, maps, pad)
            _slice_ctu_loop(payload, "B", qp, hc, wc, entry, qpctx,
                            sao, ctu_fn)
    if not pps.deblock_disabled:
        from ..ops.deblock import (bs_maps, deblock_chroma_bs_np,
                                   deblock_luma_bs_np,
                                   inter_tree_bs_maps)
        intra_m = maps["imode"] >= 0
        cbf_m = maps["cbf"].astype(bool)
        ref_m = None
        if st == 1:
            dir_m = np.where(intra_m, 0, maps["inter"])
            mv0_m = np.where(intra_m[..., None], 0, maps["mv"])
            mv1_m = np.zeros_like(mv0_m)
            if "ref" in maps:
                ref_m = np.where(intra_m, 0, maps["ref"])
        else:
            dir_m = maps["dir"]
            mv0_m = maps["mv0"]
            mv1_m = maps["mv1"]
        if split_map is not None:
            bs_v, bs_h = inter_tree_bs_maps(intra_m, cbf_m, dir_m,
                                            mv0_m, mv1_m, split_map,
                                            xp=np, ref0=ref_m)
        else:
            bs_v, bs_h = bs_maps(intra_m, cbf_m, dir_m, mv0_m, mv1_m,
                                 xp=np, ref0=ref_m)
        from ..ops.quant import chroma_qp_np
        q16 = qpctx["qp16"]
        qp_v = (q16[:, :-1] + q16[:, 1:] + 1) >> 1
        qp_h = (q16[:-1, :] + q16[1:, :] + 1) >> 1
        region = y_pl[pad:pad + hc * 16, pad:pad + wc * 16]
        y_pl[pad:pad + hc * 16, pad:pad + wc * 16] = \
            deblock_luma_bs_np(region, qp, bs_v, bs_h,
                               qp_v=qp_v, qp_h=qp_h)
        hp = pad // 2
        for pl, qpc, off in ((cb_pl, qp_cb, pps.cb_qp_offset),
                             (cr_pl, qp_cr, pps.cr_qp_offset)):
            reg = pl[hp:hp + hc * 8, hp:hp + wc * 8]
            pl[hp:hp + hc * 8, hp:hp + wc * 8] = \
                deblock_chroma_bs_np(
                    reg, qpc, bs_v, bs_h,
                    qpc_v=chroma_qp_np(qp_v, off),
                    qpc_h=chroma_qp_np(qp_h, off))
    if sao is not None:
        if split_map is not None:
            sao.apply(y_pl, pad, split_map.shape[0],
                      split_map.shape[1], cb_pl, cr_pl, ctb=32)
        else:
            sao.apply(y_pl, pad, hc, wc, cb_pl, cr_pl)
    w, h = sps.width - 2 * sps.conf_right, sps.height - 2 * sps.conf_bottom
    fy = y_pl[pad:pad + hc * 16, pad:pad + wc * 16].astype(np.uint8)
    fcb = cb_pl[pad // 2:pad // 2 + hc * 8,
                pad // 2:pad // 2 + wc * 8].astype(np.uint8)
    fcr = cr_pl[pad // 2:pad // 2 + hc * 8,
                pad // 2:pad // 2 + wc * 8].astype(np.uint8)
    out = DecodedFrame(y=fy[:h, :w], cb=fcb[:h // 2, :w // 2],
                       cr=fcr[:h // 2, :w // 2],
                       modes=maps["imode"], poc=poc)
    out.full_y, out.full_cb, out.full_cr = fy, fcb, fcr
    return out
