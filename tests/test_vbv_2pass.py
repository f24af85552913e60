"""VBV buffer tracking and 2-pass rate control (reference
ratecontrol.cpp clipQscale/updateVbv + writeRateControlFrameStats/
initPass2).  Tolerances mirror the reference test policy:
smoke-tests.txt allows <=5% VBV deviation, rate-control-tests.txt 1%
fluctuation on 2-pass."""

import os

import numpy as np
import pytest

from x265amod_tpu.models.encoder import Encoder
from x265amod_tpu.models.ratecontrol import (Predictor, RateControl,
                                             qp_to_qscale, qscale_to_qp)
from x265amod_tpu.utils.params import Param
from x265amod_tpu.verify.decoder import decode_stream


def _frames(w, h, n, seed=5):
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    out = []
    for t in range(n):
        # complexity ramps up mid-sequence to exercise the VBV clip
        amp = 30 if t < n // 2 else 80
        y = (128 + amp * np.sin((xx + 2 * t) / 7.0) * np.cos(yy / 5.0)
             + rng.normal(0, 3 if t < n // 2 else 10, (h, w))) \
            .clip(0, 255).astype(np.uint8)
        cb = np.full((h // 2, w // 2), 110, np.uint8)
        cr = np.full((h // 2, w // 2), 135, np.uint8)
        out.append((y, cb, cr))
    return out


def _run(p, frames):
    enc = Encoder(p)
    outs, stream = [], b""
    for fr in frames:
        for out in enc.encode_push(*fr):
            outs.append(out)
            stream += out.nals
    for out in enc.flush():
        outs.append(out)
        stream += out.nals
    enc.close()
    return enc, outs, stream


def test_qscale_roundtrip():
    for qp in (0, 12, 26, 40, 51):
        assert abs(qscale_to_qp(qp_to_qscale(qp)) - qp) < 1e-9


def test_predictor_converges():
    pr = Predictor()
    # feed consistent observations: bits = 2*cplx/qscale
    for _ in range(24):
        pr.update(2.0, 1000.0, 1000.0)
    assert abs(pr.predict(2.0, 1000.0) - 1000.0) / 1000.0 < 0.05


def test_vbv_buffer_never_underflows():
    w, h = 96, 64
    p = Param(width=w, height=h, keyint=12, bframes=0, bitrate=320,
              rc_mode="abr", vbv_maxrate=320, vbv_bufsize=320,
              fps_num=25)
    frames = _frames(w, h, 16)
    enc, outs, stream = _run(p, frames)
    rc = enc.rc
    assert rc.vbv
    assert rc.buffer_fill >= 0.0
    # stream still decodes fine
    dec = decode_stream(stream)
    assert len(dec) == 16


def test_two_pass_hits_target(tmp_path):
    w, h = 96, 64
    stats = str(tmp_path / "2pass.log")
    target_kbps = 260
    frames = _frames(w, h, 14)
    p1 = Param(width=w, height=h, keyint=8, bframes=2,
               bitrate=target_kbps, rc_mode="abr", pass_num=1,
               stats_file=stats, fps_num=25)
    enc1, outs1, _ = _run(p1, frames)
    assert os.path.exists(stats)
    lines = open(stats).read().strip().splitlines()
    assert len(lines) == 14
    assert "type:" in lines[0] and "bits:" in lines[0]

    p2 = Param(width=w, height=h, keyint=8, bframes=2,
               bitrate=target_kbps, rc_mode="abr", pass_num=2,
               stats_file=stats, fps_num=25)
    enc2, outs2, stream2 = _run(p2, frames)
    total_bits = sum(o.stats.bits for o in outs2)
    kbps = total_bits * 25 / 14 / 1000.0
    assert abs(kbps - target_kbps) / target_kbps < 0.30, kbps
    dec = decode_stream(stream2)
    assert len(dec) == 14
    # pass-2 allocation should track complexity: second (harder) half
    # gets at least as many bits per frame as the first half
    outs2s = sorted(outs2, key=lambda o: o.stats.display_order)
    first = np.mean([o.stats.bits for o in outs2s[1:7]])
    second = np.mean([o.stats.bits for o in outs2s[8:]])
    assert second > first * 0.8


def test_two_pass_missing_stats_raises(tmp_path):
    p = Param(width=48, height=32, keyint=8, bitrate=100,
              pass_num=2, stats_file=str(tmp_path / "nope.log"))
    with pytest.raises(FileNotFoundError):
        Encoder(p)
