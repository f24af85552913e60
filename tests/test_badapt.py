"""b-adapt (adaptive mini-GOP sizing from lookahead costs): a poorly
predicted—but not scene-cut—frame must close the open mini-GOP so B
frames don't span the low-correlation gap; the decision round-trips
through analysis save/load."""

import numpy as np

from x265amod_tpu.models.encoder import Encoder
from x265amod_tpu.utils.params import Param


def _frames(w, h, n, jolt_at=4, seed=23):
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    base = (128 + 50 * np.sin(xx / 7.0) * np.cos(yy / 5.0))
    out = []
    for t in range(n):
        y = np.roll(base, t, axis=1) + rng.normal(0, 3, (h, w))
        if t >= jolt_at:
            # half the frame switches content: predicts poorly but
            # not badly enough for a scene cut
            y[:, : w // 2] = 80 + 60 * np.sin(
                (xx[:, : w // 2] + 31 * t) / 3.0) \
                + rng.normal(0, 10, (h, w // 2))
        out.append((y.clip(0, 255).astype(np.uint8),
                    np.full((h // 2, w // 2), 100, np.uint8),
                    np.full((h // 2, w // 2), 150, np.uint8)))
    return out


def _encode(p, frames):
    enc = Encoder(p)
    outs, stream = [], b""
    for fr in frames:
        for o in enc.encode_push(*fr):
            outs.append(o)
            stream += o.nals
    for o in enc.flush():
        outs.append(o)
        stream += o.nals
    enc.close()
    return enc, outs, stream


def test_badapt_closes_gop_and_roundtrips(tmp_path):
    w, h, n = 96, 64, 8
    frames = _frames(w, h, n)
    common = dict(width=w, height=h, qp=32, keyint=250, bframes=3,
                  aq_mode=1, rc_lookahead=4, min_keyint=8)
    af = str(tmp_path / "a.npz")
    p1 = Param(**common, b_adapt=1, analysis_save=af)
    enc1, outs1, stream1 = _encode(p1, frames)
    types = {o.stats.display_order: o.stats.slice_type for o in outs1}
    # no scene cut (min_keyint blocks it; content is half-correlated)
    assert list(types.values()).count("I") == 1, types
    # the jolt at display 4 must close the mini-GOP: display 3 becomes
    # a P anchor instead of riding inside a 4-frame pyramid
    assert types[3] == "P", types
    # a b-adapt-off run keeps the fixed pyramid (display 4 is the anchor)
    p0 = Param(**common, b_adapt=0)
    _, outs0, stream0 = _encode(p0, frames)
    types0 = {o.stats.display_order: o.stats.slice_type for o in outs0}
    assert types0[4] == "P" and types0[3] == "B", types0
    assert stream0 != stream1
    # analysis load reproduces the adaptive structure byte-exactly
    p2 = Param(**common, analysis_load=af)
    _, outs2, stream2 = _encode(p2, frames)
    assert stream2 == stream1
