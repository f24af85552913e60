"""Native host components (C++), loaded via ctypes.

The reference's native runtime pieces (entropy coder, bit packer) get
native equivalents here; Python implementations remain as oracles.
Builds on first use with g++ -O3; falls back to None if no toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libhevc_cabac.so")
_SRC = os.path.join(_DIR, "cabac.cpp")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # noqa: BLE001
        sys.stderr.write(f"[native] cabac build failed: {e}\n")
        return False


def get_cabac_lib():
    """Returns the loaded ctypes library or None."""
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried:
        return None
    _tried = True
    if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        sys.stderr.write(f"[native] cabac load failed: {e}\n")
        return None
    lib.hevc_cabac_set_layout.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    lib.hevc_encode_islice_ctu16.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    lib.hevc_encode_islice_ctu16.restype = ctypes.c_int64
    lib.hevc_cabac_set_layout2.argtypes = [
        ctypes.POINTER(ctypes.c_int32)]
    lib.hevc_encode_pslice_ctu16.argtypes = [
        ctypes.POINTER(ctypes.c_int32)] * 8 + [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    lib.hevc_encode_pslice_ctu16.restype = ctypes.c_int64
    lib.hevc_encode_bslice_ctu16.argtypes = [
        ctypes.POINTER(ctypes.c_int32)] * 11 + [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    lib.hevc_encode_bslice_ctu16.restype = ctypes.c_int64

    from ..cabac.tables import CTX_OFFSET, NUM_CTX
    offs = np.array([
        CTX_OFFSET["part_mode"], CTX_OFFSET["prev_intra_luma_pred_flag"],
        CTX_OFFSET["intra_chroma_pred_mode"], CTX_OFFSET["qt_cbf"],
        CTX_OFFSET["last_sig_coeff_prefix"],
        CTX_OFFSET["last_sig_coeff_prefix"] + 18,
        CTX_OFFSET["coded_sub_block_flag"], CTX_OFFSET["sig_coeff_flag"],
        CTX_OFFSET["coeff_abs_level_greater1_flag"],
        CTX_OFFSET["coeff_abs_level_greater2_flag"],
    ], dtype=np.int32)
    lib.hevc_cabac_set_layout(
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), NUM_CTX)
    offs2 = np.array([
        CTX_OFFSET["cu_skip_flag"], CTX_OFFSET["pred_mode_flag"],
        CTX_OFFSET["merge_flag"], CTX_OFFSET["merge_idx"],
        CTX_OFFSET["abs_mvd_greater_flag"], CTX_OFFSET["mvp_flag"],
        CTX_OFFSET["rqt_root_cbf"], CTX_OFFSET["inter_pred_idc"],
    ], dtype=np.int32)
    lib.hevc_cabac_set_layout2(
        offs2.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.hevc_cabac_set_layout3.argtypes = [i32p]
    offs3 = np.array([
        CTX_OFFSET["split_cu_flag"], CTX_OFFSET["cu_qp_delta_abs"],
        CTX_OFFSET["sao_merge_flag"], CTX_OFFSET["sao_type_idx"],
        CTX_OFFSET["ref_idx"],
    ], dtype=np.int32)
    lib.hevc_cabac_set_layout3(offs3.ctypes.data_as(i32p))
    lib.hevc_encode_slice.argtypes = (
        [ctypes.c_int32] * 4 + [i32p] * 16 + [i32p, ctypes.c_int32]
        + [ctypes.c_int32] * 4 + [i32p, i32p,
                                  ctypes.POINTER(ctypes.c_uint8),
                                  ctypes.c_int64])
    lib.hevc_encode_slice.restype = ctypes.c_int64
    _lib = lib
    return _lib


def encode_slice_native(slice_type: str, ctb_log2: int, hc: int, wc: int,
                        qp: int, *, split=None, kinds=None, modes=None,
                        merge_idx=None, inter_dir=None, mvd0=None,
                        mvp0=None, mvd1=None, mvp1=None, levels_y=None,
                        levels_cb=None, levels_cr=None, qp16=None,
                        qp32=None, sao_luma=None, sao_chroma=None,
                        max_merge: int = 2, wpp: bool = False,
                        sign_hide: bool = False, ref0=None,
                        num_ref0: int = 1):
    """Unified native slice serializer (I/P/B, flat CTU16 or CTU32
    quadtree, AQ/SAO/WPP).  Returns (payload, entry_sizes) or None when
    the native lib is unavailable.  sao_luma: [n_ctu, 7] int32
    (type, eo_class, band_pos, off[4]); sao_chroma: [n_ctu, 14]
    (type, eo_class, bp_cb, off_cb[4], bp_cr, off_cr[4])."""
    lib = get_cabac_lib()
    if lib is None:
        return None
    from ..cabac.tables import init_context_states
    states = np.ascontiguousarray(
        init_context_states(slice_type, qp).astype(np.int32))
    p = ctypes.POINTER(ctypes.c_int32)

    def c(a):
        if a is None:
            return ctypes.cast(None, p)
        arr = np.ascontiguousarray(np.asarray(a), dtype=np.int32)
        _keep.append(arr)
        return arr.ctypes.data_as(p)

    _keep = []
    st = {"I": 0, "P": 1, "B": 2}[slice_type]
    nly = np.asarray(levels_y)
    cap = max(1 << 16, int(nly.size) * 8 * 2)
    out = np.empty(cap, dtype=np.uint8)
    entry = np.zeros(max(hc, 1), dtype=np.int32)
    n = lib.hevc_encode_slice(
        st, ctb_log2, hc, wc,
        c(split), c(kinds), c(modes), c(merge_idx), c(inter_dir),
        c(mvd0), c(mvp0), c(mvd1), c(mvp1),
        c(levels_y), c(levels_cb), c(levels_cr), c(qp16), c(qp32),
        c(sao_luma), c(sao_chroma),
        c(ref0), num_ref0,
        qp, max_merge, 1 if wpp else 0, 1 if sign_hide else 0,
        states.ctypes.data_as(p), entry.ctypes.data_as(p),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        return None
    use_wpp = wpp and hc > 1
    entry_sizes = [int(v) for v in entry[:hc - 1]] if use_wpp else []
    return out[:n].tobytes(), entry_sizes


def encode_islice_ctu16(modes: np.ndarray, levels_y: np.ndarray,
                        levels_cb: np.ndarray, levels_cr: np.ndarray,
                        qp: int) -> bytes | None:
    """One-call native slice encode; None if the native lib is missing."""
    lib = get_cabac_lib()
    if lib is None:
        return None
    from ..cabac.tables import init_context_states
    hc, wc = modes.shape
    states = np.ascontiguousarray(
        init_context_states("I", qp).astype(np.int32))
    m = np.ascontiguousarray(modes.astype(np.int32))
    ly = np.ascontiguousarray(levels_y.astype(np.int32))
    lcb = np.ascontiguousarray(levels_cb.astype(np.int32))
    lcr = np.ascontiguousarray(levels_cr.astype(np.int32))
    cap = max(1 << 16, ly.size * 8 + lcb.size * 8 + lcr.size * 8)
    out = np.empty(cap, dtype=np.uint8)
    p = ctypes.POINTER(ctypes.c_int32)
    n = lib.hevc_encode_islice_ctu16(
        m.ctypes.data_as(p), ly.ctypes.data_as(p), lcb.ctypes.data_as(p),
        lcr.ctypes.data_as(p), hc, wc, states.ctypes.data_as(p),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        return None
    return out[:n].tobytes()


def encode_pslice_ctu16(res, qp: int, max_merge: int = 2) -> bytes | None:
    """One-call native P-slice encode; None if the native lib is missing.

    `res` is an InterFrameResult (kinds/merge_idx/mvd/mvp_idx/modes +
    level arrays in raster order).
    """
    lib = get_cabac_lib()
    if lib is None:
        return None
    from ..cabac.tables import init_context_states
    hc, wc = res.kinds.shape
    states = np.ascontiguousarray(
        init_context_states("P", qp).astype(np.int32))
    c = lambda a: np.ascontiguousarray(a.astype(np.int32))
    kinds = c(res.kinds)
    mrg = c(res.merge_idx)
    mvd = c(res.mvd)
    mvp = c(res.mvp_idx)
    modes = c(res.modes)
    ly = c(res.levels_y)
    lcb = c(res.levels_cb)
    lcr = c(res.levels_cr)
    cap = max(1 << 16, ly.size * 8 + lcb.size * 8 + lcr.size * 8)
    out = np.empty(cap, dtype=np.uint8)
    p = ctypes.POINTER(ctypes.c_int32)
    n = lib.hevc_encode_pslice_ctu16(
        kinds.ctypes.data_as(p), mrg.ctypes.data_as(p),
        mvd.ctypes.data_as(p), mvp.ctypes.data_as(p),
        modes.ctypes.data_as(p), ly.ctypes.data_as(p),
        lcb.ctypes.data_as(p), lcr.ctypes.data_as(p),
        hc, wc, max_merge, states.ctypes.data_as(p),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        return None
    return out[:n].tobytes()


def encode_bslice_ctu16(res, qp: int, max_merge: int = 2) -> bytes | None:
    """One-call native B-slice encode; None if the native lib is
    missing.  `res` is a BFrameResult (two-list motion fields)."""
    lib = get_cabac_lib()
    if lib is None:
        return None
    from ..cabac.tables import init_context_states
    hc, wc = res.kinds.shape
    states = np.ascontiguousarray(
        init_context_states("B", qp).astype(np.int32))
    c = lambda a: np.ascontiguousarray(a.astype(np.int32))
    args = [c(res.kinds), c(res.merge_idx), c(res.inter_dir),
            c(res.mvd0), c(res.mvp0), c(res.mvd1), c(res.mvp1),
            c(res.modes), c(res.levels_y), c(res.levels_cb),
            c(res.levels_cr)]
    cap = max(1 << 16, res.levels_y.size * 8 + res.levels_cb.size * 8
              + res.levels_cr.size * 8)
    out = np.empty(cap, dtype=np.uint8)
    p = ctypes.POINTER(ctypes.c_int32)
    n = lib.hevc_encode_bslice_ctu16(
        *[a.ctypes.data_as(p) for a in args],
        hc, wc, max_merge, states.ctypes.data_as(p),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        return None
    return out[:n].tobytes()
