"""Lossless coding (transquant bypass): reconstruction must equal the
SOURCE exactly — the reference's `--lossless` bit-exactness contract
(BASELINE.md north star; reference doc/reST/lossless.rst)."""

import numpy as np
import pytest

from x265amod_tpu.models.encoder import Encoder
from x265amod_tpu.utils.params import Param
from x265amod_tpu.verify.decoder import decode_stream


def test_lossless_intra_is_bit_exact_to_source():
    w, h = 64, 48
    rng = np.random.default_rng(17)
    frames = []
    for t in range(2):
        y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        cb = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        cr = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        frames.append((y, cb, cr))
    p = Param(width=w, height=h, keyint=1, lossless=True, qp=30)
    enc = Encoder(p)
    stream = b""
    for fr in frames:
        for out in enc.encode_push(*fr):
            stream += out.nals
            assert out.stats.psnr_y > 99.0    # zero distortion
    dec = decode_stream(stream)
    assert len(dec) == 2
    for (y, cb, cr), df in zip(frames, dec):
        np.testing.assert_array_equal(df.y, y)
        np.testing.assert_array_equal(df.cb, cb)
        np.testing.assert_array_equal(df.cr, cr)


def test_lossless_smooth_content_compresses():
    # smooth content should compress well even losslessly (prediction
    # removes most of the signal)
    w, h = 64, 48
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = (128 + 40 * np.sin(xx / 16.0)).astype(np.uint8)
    cb = np.full((h // 2, w // 2), 110, np.uint8)
    cr = np.full((h // 2, w // 2), 140, np.uint8)
    p = Param(width=w, height=h, keyint=1, lossless=True)
    enc = Encoder(p)
    out = enc.encode_frame(y, cb, cr)
    raw_bits = (w * h + 2 * (w // 2) * (h // 2)) * 8
    assert out.stats.bits < raw_bits * 0.6, out.stats.bits
    dec = decode_stream(out.nals)
    np.testing.assert_array_equal(dec[0].y, y)


def test_lossless_rejects_inter_config():
    p = Param(width=64, height=48, keyint=8, lossless=True)
    with pytest.raises(AssertionError):
        Encoder(p)
