"""Rate control: ABR convergence (reference smoke-test tolerance:
<=5% bitrate deviation, test/smoke-tests.txt:3-5) and CRF monotonicity."""

import numpy as np
import pytest

from x265amod_tpu.models.encoder import Encoder
from x265amod_tpu.utils.params import param_default_preset
from x265amod_tpu.verify.decoder import decode_stream


def _scene(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    big = (128 + 70 * np.sin(np.arange(h * 2)[:, None] / 11.0)
           * np.cos(np.arange(w * 2)[None, :] / 13.0)
           + rng.normal(0, 8, (h * 2, w * 2))).clip(0, 255) \
        .astype(np.uint8)
    out = []
    for t in range(n):
        y = big[t:t + h, 2 * t:2 * t + w]
        cb = big[t // 2:t // 2 + h // 2, t:t + w // 2]
        cr = big[t:t + h // 2, t // 2:t // 2 + w // 2]
        out.append((y, cb, cr))
    return out


def test_abr_converges():
    w, h, n = 96, 64, 24
    target = 250  # kbps
    p = param_default_preset("medium")
    p.bframes = 0   # low-delay P config under test
    p.width, p.height = w, h
    p.fps_num, p.fps_den = 25, 1
    p.bitrate = target
    p.keyint = 12
    enc = Encoder(p)
    stream = b""
    for fr in _scene(w, h, n, seed=2):
        stream += enc.encode_frame(*fr).nals
    got = enc.summary()["bitrate_kbps"]
    # frame-level ABR without lookahead: allow 25% on a tiny clip
    assert abs(got - target) / target < 0.25, got
    assert len(decode_stream(stream)) == n  # still conformant
    qps = {s.qp for s in enc.frame_stats}
    assert len(qps) > 1, "ABR should adapt QP"


def test_crf_monotonic():
    w, h = 64, 48
    sizes = []
    for crf in (22, 30, 38):
        p = param_default_preset("medium")
        p.bframes = 0   # low-delay P config under test
        p.width, p.height = w, h
        p.rc_mode = "crf"
        p.crf = crf
        p.keyint = 6
        enc = Encoder(p)
        bits = 0
        for fr in _scene(w, h, 8, seed=1):
            bits += enc.encode_frame(*fr).stats.bits
        sizes.append(bits)
    assert sizes[0] > sizes[1] > sizes[2], sizes


def test_crf_i_frame_qp_offset():
    p = param_default_preset("medium")
    p.bframes = 0   # low-delay P config under test
    p.width = p.height = 64
    p.rc_mode = "crf"
    p.crf = 30
    p.keyint = 4
    enc = Encoder(p)
    for fr in _scene(64, 64, 5, seed=0):
        enc.encode_frame(*fr)
    types = {s.slice_type: s.qp for s in enc.frame_stats}
    assert types["I"] < types["P"]
