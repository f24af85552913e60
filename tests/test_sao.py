"""SAO: kernel-level jax-vs-numpy apply equality, and end-to-end
bit-exact roundtrips with SAO enabled on I/P/B slices."""

import numpy as np
import pytest

from x265amod_tpu.ops.sao import (sao_analyse, sao_apply, sao_apply_np,
                                  _eo_cat_map_np)
from x265amod_tpu.models.encoder import Encoder
from x265amod_tpu.utils.params import Param
from x265amod_tpu.verify.decoder import decode_stream


def _noisy(w, h, t=0, seed=11):
    rng = np.random.default_rng(seed + t)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = (120 + 50 * np.sin((xx + 2 * t) / 6.0) + rng.normal(0, 8, (h, w))
         ).clip(0, 255).astype(np.uint8)
    cb = np.full((h // 2, w // 2), 100, np.uint8)
    cr = np.full((h // 2, w // 2), 150, np.uint8)
    return y, cb, cr


def test_sao_apply_jax_matches_numpy():
    rng = np.random.default_rng(3)
    rec = rng.integers(0, 256, (48, 64)).astype(np.int32)
    n = (48 // 16) * (64 // 16)
    ty = rng.integers(0, 3, n).astype(np.int32)
    eo = rng.integers(0, 4, n).astype(np.int32)
    bp = rng.integers(0, 29, n).astype(np.int32)
    off = rng.integers(-7, 8, (n, 4)).astype(np.int32)
    a = np.asarray(sao_apply(rec, ty, eo, bp, off, 16))
    b = sao_apply_np(rec, ty, eo, bp, off, 16)
    np.testing.assert_array_equal(a, b)


def test_sao_analysis_improves_distortion():
    rng = np.random.default_rng(4)
    orig = (128 + 40 * np.sin(np.arange(64)[None, :] / 5.0)
            + np.zeros((48, 1))).astype(np.int32)
    rec = np.clip(orig + rng.integers(-6, 7, orig.shape), 0, 255) \
        .astype(np.int32)
    ty, eo, bp, off, gain = sao_analyse(orig, rec, 1.0, 16)
    rec2 = np.asarray(sao_apply(rec, ty, eo, bp, off, 16))
    d0 = np.sum((rec.astype(float) - orig) ** 2)
    d1 = np.sum((rec2.astype(float) - orig) ** 2)
    assert d1 < d0, (d0, d1)
    assert np.asarray(gain).min() >= -1e-3


def test_eo_category_bounds():
    rec = np.arange(32 * 32, dtype=np.int32).reshape(32, 32) % 251
    for k in range(4):
        cat = _eo_cat_map_np(rec, k)
        assert cat.min() >= 0 and cat.max() <= 4
        # picture-boundary pixels must be category 0 for the class dirs
        if k == 1:   # vertical: top/bottom rows masked
            assert (cat[0] == 0).all() and (cat[-1] == 0).all()


def _roundtrip(p, frames):
    enc = Encoder(p)
    outs, stream = [], b""
    for fr in frames:
        for out in enc.encode_push(*fr, return_recon=True):
            outs.append(out)
            stream += out.nals
    for out in enc.flush(return_recon=True):
        outs.append(out)
        stream += out.nals
    dec = decode_stream(stream)
    assert len(dec) == len(frames)
    outs.sort(key=lambda o: o.stats.display_order)
    for i, (out, df) in enumerate(zip(outs, dec)):
        assert np.array_equal(np.asarray(out.recon[0]), df.y), \
            f"frame {i} ({out.stats.slice_type}) luma"
        assert np.array_equal(np.asarray(out.recon[1]), df.cb)
        assert np.array_equal(np.asarray(out.recon[2]), df.cr)
    return outs


def test_sao_intra_roundtrip():
    w, h = 96, 64
    p = Param(width=w, height=h, qp=34, keyint=1, sao=True)
    frames = [_noisy(w, h, t) for t in range(2)]
    _roundtrip(p, frames)


def test_sao_pb_roundtrip():
    w, h = 96, 64
    p = Param(width=w, height=h, qp=34, keyint=250, bframes=2, sao=True)
    frames = [_noisy(w, h, t) for t in range(6)]
    outs = _roundtrip(p, frames)
    assert {"I", "P", "B"} <= {o.stats.slice_type for o in outs}


def test_sao_with_aq_roundtrip():
    w, h = 96, 64
    p = Param(width=w, height=h, qp=34, keyint=250, bframes=0, sao=True,
              aq_mode=2, rc_lookahead=4)
    frames = [_noisy(w, h, t) for t in range(4)]
    _roundtrip(p, frames)
