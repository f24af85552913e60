"""End-to-end conformance: encode -> in-repo golden decoder ->
bit-exact recon match (the analog of the reference's golden-bitstream
regression, SURVEY.md §4.2)."""

import numpy as np
import pytest

from x265amod_tpu.models.encoder import Encoder
from x265amod_tpu.utils.params import param_default_preset
from x265amod_tpu.verify.decoder import decode_stream


def _test_frame(w, h, seed=0, kind="gradient"):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "gradient":
        y = ((xx * 2 + yy) % 256).astype(np.uint8)
    elif kind == "noise":
        y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    else:  # structured: blocks + edges, more realistic
        y = (128 + 64 * np.sin(xx / 7.0) * np.cos(yy / 5.0)
             + rng.normal(0, 6, (h, w))).clip(0, 255).astype(np.uint8)
    cb = (128 + (xx[::2, ::2] - yy[::2, ::2]) // 4).clip(0, 255) \
        .astype(np.uint8)
    cr = (128 - (xx[::2, ::2] + yy[::2, ::2]) // 8).clip(0, 255) \
        .astype(np.uint8)
    return y, cb, cr


@pytest.mark.parametrize("size,qp,kind", [
    ((64, 48), 32, "gradient"),
    ((80, 48), 27, "structured"),
    ((64, 32), 22, "noise"),
    ((70, 40), 30, "structured"),     # non-CTU-multiple: conformance window
    ((16, 16), 37, "gradient"),       # single CTU
])
def test_encode_decode_bitexact(size, qp, kind):
    w, h = size
    p = param_default_preset("medium")
    p.width, p.height = w, h
    p.qp = qp
    p.keyint = 1    # all-intra under test (zero-latency encode_frame)
    enc = Encoder(p)
    y, cb, cr = _test_frame(w, h, seed=qp, kind=kind)
    out = enc.encode_frame(y, cb, cr, return_recon=True)
    frames = decode_stream(out.nals)
    assert len(frames) == 1
    dec = frames[0]
    assert dec.y.shape == (h, w)
    np.testing.assert_array_equal(dec.y, out.recon[0], err_msg="luma")
    np.testing.assert_array_equal(dec.cb, out.recon[1], err_msg="cb")
    np.testing.assert_array_equal(dec.cr, out.recon[2], err_msg="cr")
    # recon must be reasonably close to source at moderate QP
    if kind != "noise" and qp <= 32:
        psnr = 10 * np.log10(
            255 ** 2 / max(np.mean((dec.y.astype(float) - y) ** 2), 1e-9))
        assert psnr > 30, f"psnr {psnr}"


def test_multiframe_stream():
    p = param_default_preset("ultrafast")
    p.width, p.height = 48, 32
    p.qp = 30
    p.bframes = 0   # zero-latency single-in single-out under test
    enc = Encoder(p)
    stream = b""
    recons = []
    for i in range(3):
        y, cb, cr = _test_frame(48, 32, seed=i, kind="structured")
        out = enc.encode_frame(y, cb, cr, return_recon=True)
        stream += out.nals
        recons.append(out.recon)
    frames = decode_stream(stream)
    assert len(frames) == 3
    for dec, rec in zip(frames, recons):
        np.testing.assert_array_equal(dec.y, rec[0])
        np.testing.assert_array_equal(dec.cb, rec[1])
        np.testing.assert_array_equal(dec.cr, rec[2])
