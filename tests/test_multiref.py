"""Multi-reference P (round 5): --ref N encodes with per-CU L0
ref_idx selection, streams decode bit-exactly through the normative
decoder, and temporally-periodic content actually uses the older
references (reference behavior: per-ref ME loop search.cpp:2181)."""

import numpy as np
import pytest

from x265amod_tpu.models.encoder import Encoder
from x265amod_tpu.utils.params import Param, check_params
from x265amod_tpu.verify.decoder import decode_stream


def _flicker_frames(w, h, n, period=2, seed=5):
    """Two alternating scene patterns + per-frame noise: frame t is
    much better predicted from t-period than from t-1."""
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    bases = [
        (128 + 70 * np.sin(xx / 7.0) * np.cos(yy / 9.0)),
        (128 + 70 * np.cos(xx / 5.0) * np.sin(yy / 11.0)),
    ]
    out = []
    for t in range(n):
        y = (bases[t % period] + rng.normal(0, 2, (h, w))) \
            .clip(0, 255).astype(np.uint8)
        cb = np.full((h // 2, w // 2), 120, np.uint8)
        cr = np.full((h // 2, w // 2), 130, np.uint8)
        out.append((y, cb, cr))
    return out


def _encode(frames, w, h, ref):
    p = Param(width=w, height=h, qp=30, keyint=250, bframes=0,
              ctu_size=32, ref=ref, aq_mode=0, cutree=False)
    enc = Encoder(p)
    nals = b""
    for fr in frames:
        for out in enc.encode_push(*fr):
            nals += out.nals
    for out in enc.flush():
        nals += out.nals
    return nals, enc


def test_multiref_decodes_and_uses_older_refs():
    w, h, n = 96, 64, 6
    frames = _flicker_frames(w, h, n)
    nals, enc = _encode(frames, w, h, ref=2)
    dec = decode_stream(nals)
    assert len(dec) == n
    # bit-exact recon: re-encode with recon capture and compare
    p = Param(width=w, height=h, qp=30, keyint=250, bframes=0,
              ctu_size=32, ref=2, aq_mode=0, cutree=False)
    enc2 = Encoder(p)
    recs = []
    for fr in frames:
        recs += enc2.encode_push(*fr, return_recon=True)
    recs += enc2.flush(return_recon=True)
    for i, (d, r) in enumerate(zip(dec, recs)):
        assert np.array_equal(np.asarray(d.y, np.uint8)[:h, :w],
                              r.recon[0]), f"frame {i} luma"
        assert np.array_equal(np.asarray(d.cb, np.uint8)[:h // 2,
                                                         :w // 2],
                              r.recon[1]), f"frame {i} cb"


def test_multiref_ref1_actually_selected():
    """On period-2 flicker, a meaningful share of inter CUs must pick
    ref_idx 1 (the two-frames-back picture)."""
    w, h, n = 96, 64, 6
    frames = _flicker_frames(w, h, n)
    p = Param(width=w, height=h, qp=30, keyint=250, bframes=0,
              ctu_size=32, ref=2, aq_mode=0, cutree=False)
    enc = Encoder(p)
    ref1_cells = 0
    inter_cells = 0
    outs = []
    for i, fr in enumerate(frames):
        for e in enc._push_display_frame(*fr):
            pend = enc._dispatch_entry(e, False)
            if e["stype"] == "P" and e["poc"] >= 2:
                res = enc.inter_encoder.collect(pend["dev"])
                inter = res.kinds <= 1
                inter_cells += int(inter.sum())
                ref1_cells += int((res.ref0[inter] == 1).sum())
                outs.append(res)
            else:
                enc._finish(pend)
    assert inter_cells > 0
    frac = ref1_cells / inter_cells
    assert frac > 0.25, f"ref 1 used on only {frac:.1%} of inter cells"


def test_multiref_bitrate_not_worse_on_flicker():
    """ref 2 must cut bits vs ref 1 at equal QP on period-2 content
    (the whole point of the extra reference)."""
    w, h, n = 96, 64, 8
    frames = _flicker_frames(w, h, n)
    nals1, _ = _encode(frames, w, h, ref=1)
    nals2, _ = _encode(frames, w, h, ref=2)
    assert len(decode_stream(nals2)) == n
    assert len(nals2) < 0.8 * len(nals1), \
        f"ref2 {len(nals2)}B vs ref1 {len(nals1)}B"


def test_ref_param_validation():
    p = Param(width=64, height=64, ref=5)
    with pytest.raises(ValueError):
        check_params(p)
    p = Param(width=64, height=64, ref=2, ctu_size=16)
    with pytest.raises(ValueError):
        check_params(p)
