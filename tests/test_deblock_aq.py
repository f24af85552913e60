"""Deblocking under per-CU QP (AQ) — round-1 silently disabled the
loop filter whenever AQ was on; now the filter follows the DECODED
per-QG QP chain (spec 8.6.1 carry-forward + 8.7.2.5.3 per-edge QP
averages) so AQ + deblock streams decode bit-exactly."""

import numpy as np

from x265amod_tpu.models.encoder import Encoder
from x265amod_tpu.ops.deblock import effective_qp_map, effective_qp_map_np
from x265amod_tpu.utils.params import Param
from x265amod_tpu.verify.decoder import decode_stream


def _textured(w, h, t, seed=0):
    rng = np.random.default_rng(seed + t)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = (128 + 60 * np.sin((xx + 2 * t) / 5.0) * np.cos(yy / 4.0)
         + rng.normal(0, 6, (h, w)))
    y[:, :w // 2] = 90 + 0.05 * xx[:, :w // 2]   # flat AQ region
    cb = (110 + 20 * np.sin(yy[::2, ::2] / 3.0)).astype(np.uint8)
    cr = np.full((h // 2, w // 2), 130, np.uint8)
    return y.clip(0, 255).astype(np.uint8), cb, cr


def _encode_all(enc, frames):
    outs, stream = [], b""
    for fr in frames:
        for out in enc.encode_push(*fr, return_recon=True):
            outs.append(out)
            stream += out.nals
    for out in enc.flush(return_recon=True):
        outs.append(out)
        stream += out.nals
    return outs, stream


def _assert_bitexact(outs, stream, n):
    assert len(outs) == n
    dec = decode_stream(stream)
    assert len(dec) == n
    outs = sorted(outs, key=lambda o: o.stats.display_order)
    for i, (out, df) in enumerate(zip(outs, dec)):
        ry, rcb, rcr = out.recon
        assert np.array_equal(np.asarray(ry), df.y), \
            f"frame {i} ({out.stats.slice_type}) luma mismatch"
        assert np.array_equal(np.asarray(rcb), df.cb), f"frame {i} cb"
        assert np.array_equal(np.asarray(rcr), df.cr), f"frame {i} cr"


def test_effective_qp_map_matches_oracle():
    rng = np.random.default_rng(7)
    for wpp in (False, True):
        qp_sig = rng.integers(20, 45, (5, 7)).astype(np.int32)
        coded = rng.random((5, 7)) > 0.4
        ref = effective_qp_map_np(qp_sig, coded, 32, wpp)
        got = np.asarray(effective_qp_map(qp_sig, coded, 32, wpp))
        assert np.array_equal(ref, got), wpp


def test_aq_deblock_intra16_roundtrip():
    w, h, n = 96, 64, 2
    p = Param(width=w, height=h, qp=33, keyint=1, aq_mode=2,
              aq_strength=1.5, deblock=True, ctu_size=16)
    enc = Encoder(p)
    assert not enc.pps.deblocking_disabled, \
        "deblock must stay on under AQ"
    frames = [_textured(w, h, t) for t in range(n)]
    outs, stream = _encode_all(enc, frames)
    _assert_bitexact(outs, stream, n)


def test_aq_deblock_tree_roundtrip():
    w, h, n = 96, 64, 2
    p = Param(width=w, height=h, qp=33, keyint=1, aq_mode=2,
              aq_strength=1.5, deblock=True, ctu_size=32)
    enc = Encoder(p)
    assert enc.use_tree and not enc.pps.deblocking_disabled
    frames = [_textured(w, h, t) for t in range(n)]
    outs, stream = _encode_all(enc, frames)
    _assert_bitexact(outs, stream, n)


def test_aq_deblock_tree_wpp_roundtrip():
    w, h, n = 96, 96, 2
    p = Param(width=w, height=h, qp=33, keyint=1, aq_mode=2,
              deblock=True, ctu_size=32, wpp=True)
    enc = Encoder(p)
    frames = [_textured(w, h, t) for t in range(n)]
    outs, stream = _encode_all(enc, frames)
    _assert_bitexact(outs, stream, n)


def test_aq_deblock_bgop_roundtrip():
    w, h, n = 96, 64, 6
    p = Param(width=w, height=h, qp=32, keyint=250, bframes=2,
              aq_mode=2, cutree=True, rc_lookahead=6, deblock=True)
    enc = Encoder(p)
    assert not enc.pps.deblocking_disabled
    frames = [_textured(w, h, t) for t in range(n)]
    outs, stream = _encode_all(enc, frames)
    _assert_bitexact(outs, stream, n)
    types = [o.stats.slice_type for o in outs]
    assert "B" in types and "P" in types


def test_tree_split_qp_carryin_deblock():
    """ADVICE r2 (high): in a split CTB32, CUs decoded before the
    cu_qp_delta parse keep the carry-in qPY_PREV; the deblock QP map
    must follow the decoded per-CU chain, not a uniform per-CTB value.
    Scenario: coded flat-gradient CTB (low QP) followed by a split CTB
    whose first z-order sub-CU codes nothing and a later sub-CU signals
    a large positive delta."""
    from x265amod_tpu.utils.params import param_default_preset

    w, h = 64, 32
    p = param_default_preset("medium")
    p.width, p.height = w, h
    p.qp = 30
    p.keyint = 1
    p.ctu_size = 32
    p.deblock = True
    p.sao = False
    p.wpp = False
    p.aq_mode = 2
    enc = Encoder(p)
    assert enc.use_tree

    # crafted per-16-cell AQ offsets: CTB0 -> QP 22, CTB1 -> QP 40
    off = np.zeros((2, 4), np.float32)
    off[:, 0:2] = -8.0
    off[:, 2:4] = +10.0
    enc.lookahead.ctu_qp_offsets = lambda fa: off

    rng = np.random.default_rng(3)
    y = np.zeros((h, w), np.float64)
    xx = np.arange(32, dtype=np.float64)
    y[:, 0:32] = 100 + 0.8 * xx[None, :]            # coded at QP 22
    y[0:16, 32:48] = y[0, 31]                       # tl: flat, uncoded
    y[0:16, 48:64] = 60 + rng.normal(0, 40, (16, 16))
    y[16:32, 32:48] = 200 + rng.normal(0, 40, (16, 16))
    y[16:32, 48:64] = np.where((np.indices((16, 16)).sum(0) % 2) == 0,
                               30, 220)
    y = y.clip(0, 255).astype(np.uint8)
    cb = np.full((h // 2, w // 2), 120, np.uint8)
    cr = np.full((h // 2, w // 2), 128, np.uint8)

    # dispatch by hand so the device-side split/cbf state is inspectable
    entries = enc._push_display_frame(y, cb, cr)
    assert len(entries) == 1
    pend = enc._dispatch_entry(entries[0], True)
    res = enc.frame_encoder.collect(pend["dev"], want_recon=True)
    coded16 = (res.levels_y.any((2, 3)) | res.levels_cb.any((2, 3))
               | res.levels_cr.any((2, 3)))
    # the scenario must actually occur: CTB1 split, its first z-order
    # sub-CU uncoded, CTB0 coded (so the carry-in QP is CTB0's 22)
    assert res.split[0, 1] == 1
    assert not coded16[0, 2]
    assert coded16[:, :2].any()
    out = enc._finish(pend)
    dec = decode_stream(out.nals)
    assert len(dec) == 1
    np.testing.assert_array_equal(dec[0].y, out.recon[0])
    np.testing.assert_array_equal(dec[0].cb, out.recon[1])
    np.testing.assert_array_equal(dec[0].cr, out.recon[2])
