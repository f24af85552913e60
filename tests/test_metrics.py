"""Device SSIM metric vs numpy oracle, and its flow through encoder
stats / CSV (reference framefilter.cpp:654 metric computation)."""

import numpy as np

from x265amod_tpu.ops.metrics import ssim_plane, ssim_plane_np
from x265amod_tpu.models.encoder import Encoder
from x265amod_tpu.utils.params import Param


def test_ssim_jax_matches_numpy():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, (64, 96)).astype(np.int32)
    b = np.clip(a + rng.normal(0, 5, a.shape), 0, 255).astype(np.int32)
    sj = float(ssim_plane(a, b))
    sn = ssim_plane_np(a, b)
    assert abs(sj - sn) < 1e-4
    assert abs(float(ssim_plane(a, a)) - 1.0) < 1e-6
    # heavier distortion scores lower
    c = np.clip(a + rng.normal(0, 25, a.shape), 0, 255).astype(np.int32)
    assert float(ssim_plane(a, c)) < sj < 1.0


def test_encoder_reports_ssim():
    w, h = 64, 48
    rng = np.random.default_rng(6)
    y = (128 + 40 * np.sin(np.arange(w)[None, :] / 5.0)
         + rng.normal(0, 6, (h, w))).clip(0, 255).astype(np.uint8)
    cb = np.full((h // 2, w // 2), 100, np.uint8)
    cr = np.full((h // 2, w // 2), 150, np.uint8)
    p = Param(width=w, height=h, qp=30, keyint=1)
    enc = Encoder(p)
    out = enc.encode_frame(y, cb, cr)
    assert 0.5 < out.stats.ssim_y <= 1.0
    s = enc.summary()
    assert 0.5 < s["ssim_y"] <= 1.0


def test_aud_and_eos_nals():
    from x265amod_tpu.verify.decoder import decode_stream
    w, h = 48, 32
    y = np.full((h, w), 128, np.uint8)
    cb = np.full((h // 2, w // 2), 100, np.uint8)
    cr = np.full((h // 2, w // 2), 150, np.uint8)
    p = Param(width=w, height=h, qp=30, keyint=1, aud=True)
    enc = Encoder(p)
    out = enc.encode_frame(y, cb, cr)
    stream = out.nals + enc.end_of_stream()
    # AUD (35) present before the slice, EOS (36) at the end
    assert bytes([35 << 1]) in stream
    assert stream[-2] == (36 << 1)   # EOS nal header, empty rbsp
    dec = decode_stream(stream)     # decoder skips AUD/EOS
    assert len(dec) == 1


def test_qpfile_forces_type_and_qp(tmp_path):
    from x265amod_tpu.verify.decoder import decode_stream
    rng = np.random.default_rng(9)
    w, h, n = 64, 48, 6
    frames = []
    for t in range(n):
        y = (128 + 40 * np.sin((np.arange(w)[None, :] + 2 * t) / 5.0)
             + rng.normal(0, 4, (h, w))).clip(0, 255).astype(np.uint8)
        frames.append((y, np.full((h // 2, w // 2), 100, np.uint8),
                       np.full((h // 2, w // 2), 150, np.uint8)))
    qpf = tmp_path / "qp.txt"
    qpf.write_text("3 I 40\n5 P 24\n")
    p = Param(width=w, height=h, qp=30, keyint=250, bframes=2,
              qpfile=str(qpf))
    enc = Encoder(p)
    outs, stream = [], b""
    for fr in frames:
        for o in enc.encode_push(*fr):
            outs.append(o)
            stream += o.nals
    for o in enc.flush():
        outs.append(o)
        stream += o.nals
    info = {o.stats.display_order: o.stats for o in outs}
    assert info[3].slice_type == "I" and info[3].qp == 40
    assert info[5].slice_type == "P" and info[5].qp == 24
    assert len(decode_stream(stream)) == n
