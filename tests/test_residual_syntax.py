"""Residual coding + CU syntax roundtrip: encoder bins -> normative
decoder -> identical coefficient levels.  This is the conformance test
for the hardest part of the entropy layer."""

import numpy as np
import pytest

from x265amod_tpu.cabac.engine import CabacDecoder, CabacEncoder
from x265amod_tpu.cabac.syntax import (encode_intra_ctu16, mpm_list,
                                       residual_coding)
from x265amod_tpu.verify.decoder import decode_residual


def _sparse_levels(rng, n, density, max_abs=40):
    lv = np.zeros((n, n), dtype=np.int32)
    mask = rng.random((n, n)) < density
    vals = rng.integers(1, max_abs + 1, (n, n)) * \
        rng.choice([-1, 1], (n, n))
    lv[mask] = vals[mask]
    if not lv.any():
        lv[rng.integers(0, n), rng.integers(0, n)] = 1
    return lv


@pytest.mark.parametrize("log2n", [2, 3, 4, 5])
@pytest.mark.parametrize("density", [0.02, 0.15, 0.6, 1.0])
@pytest.mark.parametrize("c_idx", [0, 1])
def test_residual_roundtrip(log2n, density, c_idx):
    if c_idx and log2n == 5:
        pytest.skip("32x32 chroma TU does not occur")
    n = 1 << log2n
    rng = np.random.default_rng(log2n * 31 + int(density * 100) + c_idx)
    enc = CabacEncoder()
    enc.init_contexts("I", 30)
    blocks = [_sparse_levels(rng, n, density) for _ in range(6)]
    for lv in blocks:
        residual_coding(enc, lv, log2n, c_idx, 0)
    enc.encode_terminate(1)
    dec = CabacDecoder(enc.finish(), "I", 30)
    for i, lv in enumerate(blocks):
        got = decode_residual(dec, log2n, c_idx, 0)
        np.testing.assert_array_equal(got, lv, err_msg=f"block {i}")
    assert dec.decode_terminate() == 1


@pytest.mark.parametrize("scan_idx", [1, 2])
def test_residual_roundtrip_hor_ver_scans(scan_idx):
    rng = np.random.default_rng(scan_idx)
    for log2n in (2, 3):
        n = 1 << log2n
        enc = CabacEncoder()
        enc.init_contexts("I", 27)
        blocks = [_sparse_levels(rng, n, 0.3) for _ in range(4)]
        for lv in blocks:
            residual_coding(enc, lv, log2n, 0, scan_idx)
        enc.encode_terminate(1)
        dec = CabacDecoder(enc.finish(), "I", 27)
        for lv in blocks:
            got = decode_residual(dec, log2n, 0, scan_idx)
            np.testing.assert_array_equal(got, lv)


def test_residual_extreme_levels():
    # exercise the EG(k) escape path with large coefficients
    enc = CabacEncoder()
    enc.init_contexts("I", 0)
    lv = np.zeros((8, 8), dtype=np.int32)
    lv[0, 0] = 32767
    lv[1, 0] = -32768 + 1
    lv[7, 7] = 12345
    lv[3, 4] = -1
    residual_coding(enc, lv, 3, 0, 0)
    enc.encode_terminate(1)
    dec = CabacDecoder(enc.finish(), "I", 0)
    got = decode_residual(dec, 3, 0, 0)
    np.testing.assert_array_equal(got, lv)


def test_mpm_list_spec_cases():
    assert mpm_list(1, 1) == [0, 1, 26]
    assert mpm_list(0, 0) == [0, 1, 26]
    # angular equal: m, m-1, m+1 in angular wrap space
    assert mpm_list(10, 10) == [10, 9, 11]
    assert mpm_list(2, 2) == [2, 33, 3]
    assert mpm_list(34, 34) == [34, 33, 3]
    # distinct
    assert mpm_list(5, 1) == [5, 1, 0]
    assert mpm_list(0, 1) == [0, 1, 26]
    assert mpm_list(0, 7) == [0, 7, 1]


@pytest.mark.parametrize("seed", range(4))
def test_ctu_syntax_roundtrip(seed):
    from x265amod_tpu.verify import decoder as D
    rng = np.random.default_rng(seed)
    enc = CabacEncoder()
    enc.init_contexts("I", 32)
    ctus = []
    left_mode = 1
    for k in range(12):
        mode = int(rng.integers(0, 35))
        ly = _sparse_levels(rng, 16, 0.1) if rng.random() < 0.8 else \
            np.zeros((16, 16), np.int32)
        lcb = _sparse_levels(rng, 8, 0.1) if rng.random() < 0.5 else \
            np.zeros((8, 8), np.int32)
        lcr = _sparse_levels(rng, 8, 0.1) if rng.random() < 0.5 else \
            np.zeros((8, 8), np.int32)
        encode_intra_ctu16(enc, mode, ly, lcb, lcr, left_mode, 1)
        ctus.append((mode, ly, lcb, lcr, left_mode))
        left_mode = mode
        enc.encode_terminate(0)
    enc.encode_terminate(1)

    dec = CabacDecoder(enc.finish(), "I", 32)
    left_mode = 1
    from x265amod_tpu.cabac import syntax as S
    for k, (mode, ly, lcb, lcr, lm) in enumerate(ctus):
        # mirror CU parse (without recon) inline
        assert dec.decode_bin(S.CTX_PART_MODE) == 1
        mpms = mpm_list(left_mode, 1)
        if dec.decode_bin(S.CTX_PREV_INTRA):
            idx = 0
            if dec.decode_bypass():
                idx = 1 + dec.decode_bypass()
            got_mode = mpms[idx]
        else:
            rem = dec.decode_bypass_bins(5)
            for m in sorted(mpms):
                if rem >= m:
                    rem += 1
            got_mode = rem
        assert got_mode == mode, f"ctu {k}"
        assert dec.decode_bin(S.CTX_CHROMA_PRED) == 0
        cbf_cb = dec.decode_bin(S.CTX_QT_CBF_CHROMA)
        cbf_cr = dec.decode_bin(S.CTX_QT_CBF_CHROMA)
        cbf_y = dec.decode_bin(S.CTX_QT_CBF_LUMA + 1)
        assert cbf_y == int(ly.any())
        assert cbf_cb == int(lcb.any())
        assert cbf_cr == int(lcr.any())
        if cbf_y:
            np.testing.assert_array_equal(decode_residual(dec, 4, 0, 0), ly)
        if cbf_cb:
            np.testing.assert_array_equal(decode_residual(dec, 3, 1, 0), lcb)
        if cbf_cr:
            np.testing.assert_array_equal(decode_residual(dec, 3, 2, 0), lcr)
        assert dec.decode_terminate() == 0
        left_mode = mode
    assert dec.decode_terminate() == 1
