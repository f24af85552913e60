"""Low-delay P end-to-end conformance: encode IDR + P frames ->
normative decode -> bit-exact recon match (BASELINE.md config 2)."""

import numpy as np
import pytest

from x265amod_tpu.models.encoder import Encoder
from x265amod_tpu.utils.params import param_default_preset
from x265amod_tpu.verify.decoder import decode_stream


def _moving_scene(w, h, n, seed=0):
    """Translating textured scene: exercises ME, skip and intra refresh."""
    rng = np.random.default_rng(seed)
    big = (128 + 60 * np.sin(np.arange(h * 2)[:, None] / 9.0)
           * np.cos(np.arange(w * 2)[None, :] / 7.0)
           + rng.normal(0, 5, (h * 2, w * 2))).clip(0, 255).astype(np.uint8)
    frames = []
    for t in range(n):
        dx, dy = 2 * t, t
        y = big[dy:dy + h, dx:dx + w]
        cb = (128 + (big[dy:dy + h:2, dx:dx + w:2].astype(int) - 128) // 3) \
            .clip(0, 255).astype(np.uint8)
        cr = np.full((h // 2, w // 2), 120, np.uint8)
        frames.append((y, cb, cr))
    return frames


@pytest.mark.parametrize("qp", [27, 35])
def test_lowdelay_p_bitexact(qp):
    w, h = 96, 64
    p = param_default_preset("medium")
    p.bframes = 0   # low-delay P config under test
    p.width, p.height = w, h
    p.qp = qp
    p.keyint = 8
    enc = Encoder(p)
    frames = _moving_scene(w, h, 5)
    stream = b""
    recons = []
    kinds_seen = set()
    for fr in frames:
        out = enc.encode_frame(*fr, return_recon=True)
        stream += out.nals
        recons.append(out.recon)
    dec = decode_stream(stream)
    assert len(dec) == 5
    for i, (df, rec) in enumerate(zip(dec, recons)):
        np.testing.assert_array_equal(df.y, rec[0], err_msg=f"frame {i} Y")
        np.testing.assert_array_equal(df.cb, rec[1],
                                      err_msg=f"frame {i} Cb")
        np.testing.assert_array_equal(df.cr, rec[2],
                                      err_msg=f"frame {i} Cr")
    # P frames should be much cheaper than the IDR
    sizes = [s.bits for s in enc.frame_stats]
    assert sizes[1] < sizes[0] * 0.8, sizes
    assert enc.frame_stats[1].slice_type == "P"


def test_static_scene_mostly_skip():
    w, h = 64, 48
    p = param_default_preset("medium")
    p.bframes = 0   # low-delay P config under test
    p.width, p.height = w, h
    p.qp = 30
    p.keyint = 100
    enc = Encoder(p)
    rng = np.random.default_rng(1)
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    cb = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    cr = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    stream = b""
    recons = []
    for _ in range(3):
        out = enc.encode_frame(y, cb, cr, return_recon=True)
        stream += out.nals
        recons.append(out.recon)
    dec = decode_stream(stream)
    for df, rec in zip(dec, recons):
        np.testing.assert_array_equal(df.y, rec[0])
        np.testing.assert_array_equal(df.cb, rec[1])
        np.testing.assert_array_equal(df.cr, rec[2])
    # static P frames should be tiny (all-skip) and identical to frame 0
    assert enc.frame_stats[1].bits < enc.frame_stats[0].bits * 0.05
    np.testing.assert_array_equal(recons[1][0], recons[0][0])


def test_keyint_idr_cadence():
    w, h = 48, 32
    p = param_default_preset("medium")
    p.bframes = 0   # low-delay P config under test
    p.width, p.height = w, h
    p.qp = 32
    p.keyint = 2
    enc = Encoder(p)
    frames = _moving_scene(w, h, 4, seed=3)
    stream = b""
    for fr in frames:
        stream += enc.encode_frame(*fr).nals
    types = [s.slice_type for s in enc.frame_stats]
    assert types == ["I", "P", "I", "P"]
    dec = decode_stream(stream)
    assert len(dec) == 4
