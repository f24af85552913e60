"""Main10 (10-bit) all-intra: encode with internal_bit_depth=10,
normative-decode bit-exactly, SPS signals Main10, PSNR uses the 10-bit
peak.  Reference scope: HIGH_BIT_DEPTH builds (CMakeLists.txt:26-427);
v1 slice = all-intra CTU32 tree (params gate the rest loudly)."""

import numpy as np
import pytest

from x265amod_tpu.models.encoder import Encoder
from x265amod_tpu.utils.params import Param, check_params
from x265amod_tpu.verify.decoder import decode_stream, parse_sps


def _frames10(w, h, n, seed=7):
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    out = []
    for t in range(n):
        y = (512 + 320 * np.sin((xx + 3 * t) / 11.0)
             * np.cos((yy - 2 * t) / 7.0)
             + rng.normal(0, 12, (h, w))).clip(0, 1023) \
            .astype(np.uint16)
        cb = (512 + 120 * np.sin((xx[::2, ::2] + t) / 19.0)) \
            .clip(0, 1023).astype(np.uint16)
        cr = (512 - 120 * np.cos((yy[::2, ::2] + t) / 23.0)) \
            .clip(0, 1023).astype(np.uint16)
        out.append((y, cb, cr))
    return out


def test_main10_allintra_roundtrip():
    w, h, n = 96, 64, 3
    p = Param(width=w, height=h, qp=30, keyint=1, ctu_size=32,
              internal_bit_depth=10, deblock=False, sao=False)
    enc = Encoder(p)
    frames = _frames10(w, h, n)
    nals = b""
    recs = []
    for fr in frames:
        out = enc.encode_frame(*fr, return_recon=True)
        nals += out.nals
        recs.append(out.recon)
        assert out.stats.psnr_y > 30.0
    dec = decode_stream(nals)
    assert len(dec) == n
    for i, (d, r) in enumerate(zip(dec, recs)):
        assert d.y.dtype == np.uint16
        assert np.array_equal(np.asarray(d.y)[:h, :w], r[0]), \
            f"frame {i} luma"
        assert np.array_equal(np.asarray(d.cb)[:h // 2, :w // 2],
                              r[1]), f"frame {i} cb"
        assert np.array_equal(np.asarray(d.cr)[:h // 2, :w // 2],
                              r[2]), f"frame {i} cr"
    # recon must actually use the 10-bit range
    assert max(int(r[0].max()) for r in recs) > 255


def test_main10_sps_signals_profile():
    w, h = 64, 64
    p = Param(width=w, height=h, qp=30, keyint=1, ctu_size=32,
              internal_bit_depth=10, deblock=False, sao=False)
    enc = Encoder(p)
    assert enc.sps.profile_idc == 2 and enc.sps.bit_depth == 10
    from x265amod_tpu.bitstream.nal import split_annexb
    hdr = enc.headers()
    for t, _, rbsp in split_annexb(hdr):
        if t == 33:                      # SPS
            sps = parse_sps(rbsp)
            assert sps.bit_depth == 10


def test_main10_param_gates():
    with pytest.raises(ValueError):
        check_params(Param(width=64, height=64, internal_bit_depth=10,
                           ctu_size=16, keyint=1))
    with pytest.raises(ValueError):
        check_params(Param(width=64, height=64, internal_bit_depth=10,
                           ctu_size=32, keyint=250, deblock=False))
