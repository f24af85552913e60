"""RDOQ level 1 (ops/rdoq.py; role of reference quant.cpp:610
rdoQuant): levels only move toward zero, streams stay decodable
bit-exact, and the rate-distortion tradeoff pays — fewer bits at a
bounded PSNR cost on the bench-style clip."""

import numpy as np

from x265amod_tpu.models.encoder import Encoder
from x265amod_tpu.utils.params import Param
from x265amod_tpu.verify.decoder import decode_stream


def _frames(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    out = []
    for t in range(n):
        y = (128 + 80 * np.sin((xx + 3 * t) / 11.0)
             * np.cos((yy - 2 * t) / 7.0)
             + rng.normal(0, 4, (h, w))).clip(0, 255).astype(np.uint8)
        cb = (128 + 30 * np.sin((xx[::2, ::2] + t) / 19.0)) \
            .clip(0, 255).astype(np.uint8)
        cr = (128 - 30 * np.cos((yy[::2, ::2] + t) / 23.0)) \
            .clip(0, 255).astype(np.uint8)
        out.append((y, cb, cr))
    return out


def _run(frames, w, h, rdoq, keyint=250):
    p = Param(width=w, height=h, qp=32, keyint=keyint, bframes=0,
              ctu_size=32, aq_mode=0, cutree=False,
              rdoq_level=1 if rdoq else 0)
    enc = Encoder(p)
    nals = b""
    for fr in frames:
        for out in enc.encode_push(*fr):
            nals += out.nals
    for out in enc.flush():
        nals += out.nals
    s = enc.summary()
    return nals, s


def test_rdoq_adjust_only_decreases_levels():
    from x265amod_tpu.ops.rdoq import rdoq_adjust
    from x265amod_tpu.ops.quant import quant_np
    from x265amod_tpu.ops.transforms import fwd_transform_np
    rng = np.random.default_rng(1)
    resi = rng.integers(-60, 61, (8, 16, 16)).astype(np.int32)
    coeff = np.stack([fwd_transform_np(r) for r in resi])
    qp = np.full((8,), 30)
    lv = np.stack([quant_np(c, 30) for c in coeff])
    adj = np.asarray(rdoq_adjust(coeff, lv, qp, np.full((8,), 40.0)))
    assert (np.abs(adj) <= np.abs(lv)).all()
    assert np.array_equal(np.sign(adj) * np.sign(lv) < 0,
                          np.zeros_like(adj, bool))


def test_rdoq_stream_decodes_and_saves_bits():
    w, h, n = 96, 64, 6
    frames = _frames(w, h, n)
    nals_off, s_off = _run(frames, w, h, rdoq=False)
    nals_on, s_on = _run(frames, w, h, rdoq=True)
    dec = decode_stream(nals_on)
    assert len(dec) == n
    assert len(nals_on) < len(nals_off), \
        (len(nals_on), len(nals_off))
    # quality must not collapse: bounded PSNR cost for the bit saving
    assert s_on["psnr_y"] > s_off["psnr_y"] - 0.6, \
        (s_on["psnr_y"], s_off["psnr_y"])


def test_rdoq_intra_stream_decodes():
    w, h, n = 96, 64, 3
    frames = _frames(w, h, n, seed=3)
    nals_on, _ = _run(frames, w, h, rdoq=True, keyint=1)
    assert len(decode_stream(nals_on)) == n
