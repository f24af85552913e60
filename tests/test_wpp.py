"""WPP (entropy_coding_sync): per-row CABAC substreams with context
inheritance from the above-right CTU, entry points in the slice
header, end_of_subset terminators — bit-exact roundtrips on I/P/B,
including the per-row qPY_PREV reset with AQ."""

import numpy as np

from x265amod_tpu.models.encoder import Encoder
from x265amod_tpu.utils.params import Param
from x265amod_tpu.verify.decoder import decode_stream


def _frames(w, h, n, seed=9):
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    out = []
    for t in range(n):
        y = (128 + 55 * np.sin((xx + 2 * t) / 6.0) * np.cos(yy / 5.0)
             + rng.normal(0, 5, (h, w))).clip(0, 255).astype(np.uint8)
        cb = np.full((h // 2, w // 2), 105, np.uint8)
        cr = np.full((h // 2, w // 2), 145, np.uint8)
        out.append((y, cb, cr))
    return out


def _roundtrip(p, frames):
    enc = Encoder(p)
    outs, stream = [], b""
    for fr in frames:
        for out in enc.encode_push(*fr, return_recon=True):
            outs.append(out)
            stream += out.nals
    for out in enc.flush(return_recon=True):
        outs.append(out)
        stream += out.nals
    dec = decode_stream(stream)
    assert len(dec) == len(frames)
    outs.sort(key=lambda o: o.stats.display_order)
    for i, (out, df) in enumerate(zip(outs, dec)):
        assert np.array_equal(np.asarray(out.recon[0]), df.y), \
            f"frame {i} ({out.stats.slice_type})"
        assert np.array_equal(np.asarray(out.recon[1]), df.cb)
        assert np.array_equal(np.asarray(out.recon[2]), df.cr)
    return outs, stream


def test_wpp_intra_roundtrip():
    w, h = 96, 64    # 4 CTU rows -> 4 substreams, 3 entry points
    p = Param(width=w, height=h, qp=30, keyint=1, wpp=True)
    outs, stream = _roundtrip(p, _frames(w, h, 2))
    # WPP should cost only slightly more than non-WPP (<1% reference
    # contract is for big frames; allow 15% on this tiny one)
    p2 = Param(width=w, height=h, qp=30, keyint=1, wpp=False)
    outs2, _ = _roundtrip(p2, _frames(w, h, 2))
    b1 = sum(o.stats.bits for o in outs)
    b2 = sum(o.stats.bits for o in outs2)
    assert b1 < b2 * 1.15, (b1, b2)


def test_wpp_pb_roundtrip():
    w, h = 96, 64
    p = Param(width=w, height=h, qp=31, keyint=250, bframes=2, wpp=True)
    outs, _ = _roundtrip(p, _frames(w, h, 6))
    assert {"I", "P", "B"} <= {o.stats.slice_type for o in outs}


def test_wpp_with_aq_row_qp_reset():
    w, h = 96, 64
    p = Param(width=w, height=h, qp=31, keyint=250, bframes=0, wpp=True,
              aq_mode=2, aq_strength=1.5, rc_lookahead=4)
    _roundtrip(p, _frames(w, h, 4))


def test_wpp_with_sao():
    w, h = 96, 64
    p = Param(width=w, height=h, qp=33, keyint=250, bframes=0, wpp=True,
              sao=True)
    _roundtrip(p, _frames(w, h, 3))


def test_wpp_single_ctu_row():
    # one CTU row -> no entry points, degenerates to plain coding
    p = Param(width=96, height=16, qp=30, keyint=1, wpp=True)
    _roundtrip(p, _frames(96, 16, 1))
