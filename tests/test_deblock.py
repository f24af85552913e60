"""Deblocking: JAX batched kernel vs numpy spec oracle; e2e with
deblock enabled must stay bit-exact encoder-vs-decoder."""

import numpy as np
import pytest

from x265amod_tpu.ops.deblock import (deblock_chroma, deblock_chroma_np,
                                      deblock_luma, deblock_luma_np)


@pytest.mark.parametrize("qp", [18, 27, 37, 51])
@pytest.mark.parametrize("seed", [0, 3])
def test_luma_jax_matches_oracle(qp, seed):
    rng = np.random.default_rng(seed)
    h, w = 64, 96
    # blocky content (encode-like): per-16 block DC + noise
    base = rng.integers(0, 256, (h // 16, w // 16))
    plane = np.repeat(np.repeat(base, 16, 0), 16, 1) + \
        rng.integers(-6, 7, (h, w))
    plane = plane.clip(0, 255).astype(np.uint8)
    ref = deblock_luma_np(plane, qp)
    got = np.asarray(deblock_luma(plane.astype(np.int32), qp))
    np.testing.assert_array_equal(got, ref)
    if qp >= 27:
        assert not np.array_equal(ref, plane), "filter should modify"


@pytest.mark.parametrize("qp", [20, 33, 45])
def test_chroma_jax_matches_oracle(qp):
    rng = np.random.default_rng(qp)
    h, w = 32, 48
    base = rng.integers(0, 256, (h // 8, w // 8))
    plane = np.repeat(np.repeat(base, 8, 0), 8, 1) + \
        rng.integers(-4, 5, (h, w))
    plane = plane.clip(0, 255).astype(np.uint8)
    ref = deblock_chroma_np(plane, qp)
    got = np.asarray(deblock_chroma(plane.astype(np.int32), qp))
    np.testing.assert_array_equal(got, ref)


def test_e2e_with_deblock():
    from x265amod_tpu.models.encoder import Encoder
    from x265amod_tpu.utils.params import param_default_preset
    from x265amod_tpu.verify.decoder import decode_stream
    rng = np.random.default_rng(5)
    w, h = 64, 48
    p = param_default_preset("medium")
    p.width, p.height = w, h
    p.qp = 35
    p.keyint = 1      # deblock currently gated to all-intra streams
    p.deblock = True
    enc = Encoder(p)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (128 + 90 * np.sin(xx / 9.0) + rng.normal(0, 5, (h, w))) \
        .clip(0, 255).astype(np.uint8)
    cb = (128 + 20 * np.cos(yy[::2, ::2] / 6.0)).clip(0, 255) \
        .astype(np.uint8)
    cr = np.full((h // 2, w // 2), 128, np.uint8)
    out = enc.encode_frame(y, cb, cr, return_recon=True)
    dec = decode_stream(out.nals)[0]
    np.testing.assert_array_equal(dec.y, out.recon[0])
    np.testing.assert_array_equal(dec.cb, out.recon[1])
    np.testing.assert_array_equal(dec.cr, out.recon[2])
    # deblock on vs off should differ at high QP
    p2 = param_default_preset("medium")
    p2.width, p2.height = w, h
    p2.qp = 35
    p2.keyint = 1
    p2.deblock = False    # presets enable deblock by default (x265 parity)
    enc2 = Encoder(p2)
    out2 = enc2.encode_frame(y, cb, cr, return_recon=True)
    assert not np.array_equal(out.recon[0], out2.recon[0])
