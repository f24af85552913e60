"""Lookahead (AQ / scene-cut / CU-tree) + cu_qp_delta end-to-end:
adaptive per-CTU QP streams must decode bit-exactly, and scene cuts
must force IDRs."""

import numpy as np
import pytest

from x265amod_tpu.models.encoder import Encoder
from x265amod_tpu.models.lookahead import (Lookahead, aq_offsets,
                                           lowres_half,
                                           lowres_inter_cost,
                                           lowres_intra_cost)
from x265amod_tpu.utils.params import Param
from x265amod_tpu.verify.decoder import decode_stream


def _textured(w, h, t, seed=0, flat_left=True):
    rng = np.random.default_rng(seed + t)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = (128 + 60 * np.sin((xx + 2 * t) / 5.0) * np.cos(yy / 4.0)
         + rng.normal(0, 6, (h, w)))
    if flat_left:                    # flat region: AQ should lower QP
        y[:, :w // 2] = 90 + 0.05 * xx[:, :w // 2]
    cb = np.full((h // 2, w // 2), 110, np.uint8)
    cr = np.full((h // 2, w // 2), 130, np.uint8)
    return y.clip(0, 255).astype(np.uint8), cb, cr


def _encode_all(enc, frames):
    outs, stream = [], b""
    for fr in frames:
        for out in enc.encode_push(*fr, return_recon=True):
            outs.append(out)
            stream += out.nals
    for out in enc.flush(return_recon=True):
        outs.append(out)
        stream += out.nals
    return outs, stream


def _assert_bitexact(outs, stream, n):
    assert len(outs) == n
    dec = decode_stream(stream)
    assert len(dec) == n
    outs = sorted(outs, key=lambda o: o.stats.display_order)
    for i, (out, df) in enumerate(zip(outs, dec)):
        ry, rcb, rcr = out.recon
        assert np.array_equal(np.asarray(ry), df.y), \
            f"frame {i} ({out.stats.slice_type}) luma mismatch"
        assert np.array_equal(np.asarray(rcb), df.cb), f"frame {i} cb"
        assert np.array_equal(np.asarray(rcr), df.cr), f"frame {i} cr"
    return dec


def test_aq_intra_roundtrip():
    w, h, n = 96, 64, 3
    p = Param(width=w, height=h, qp=32, keyint=1, aq_mode=2,
              aq_strength=1.5)
    enc = Encoder(p)
    frames = [_textured(w, h, t) for t in range(n)]
    outs, stream = _encode_all(enc, frames)
    _assert_bitexact(outs, stream, n)


def test_aq_cutree_bgop_roundtrip():
    w, h, n = 96, 64, 8
    p = Param(width=w, height=h, qp=32, keyint=250, bframes=2,
              aq_mode=2, cutree=True, rc_lookahead=6)
    enc = Encoder(p)
    frames = [_textured(w, h, t) for t in range(n)]
    outs, stream = _encode_all(enc, frames)
    _assert_bitexact(outs, stream, n)
    types = [o.stats.slice_type for o in outs]
    assert "B" in types and "P" in types


def test_scenecut_forces_idr():
    w, h, n = 64, 48, 8
    p = Param(width=w, height=h, qp=30, keyint=250, bframes=2,
              aq_mode=1, rc_lookahead=4, min_keyint=2)
    enc = Encoder(p)
    frames = []
    for t in range(n):
        if t < 4:                     # scene A: slow pan
            frames.append(_textured(w, h, t, seed=0))
        else:                         # scene B: different content
            rng = np.random.default_rng(99 + t)
            y = rng.integers(0, 255, (h, w)).astype(np.uint8)
            frames.append((y, np.full((h // 2, w // 2), 60, np.uint8),
                           np.full((h // 2, w // 2), 200, np.uint8)))
    outs, stream = _encode_all(enc, frames)
    dec = _assert_bitexact(outs, stream, n)
    idrs = [o.stats.display_order for o in outs
            if o.stats.slice_type == "I"]
    assert 4 in idrs, f"scene cut at display 4 not detected: {idrs}"


def test_aq_offsets_sign():
    # textured half should get positive offsets, flat half negative
    y, cb, cr = _textured(128, 64, 0)
    off = np.asarray(aq_offsets(y, cb, cr, 1.0))
    assert off.shape == (4, 8)
    assert off[:, :4].mean() < 0 < off[:, 4:].mean()


def test_lowres_costs_shape_and_motion():
    y0, _, _ = _textured(128, 64, 0, flat_left=False)
    y1 = np.roll(y0, 3, axis=1)       # pure horizontal shift
    lr0 = lowres_half(y0)
    lr1 = lowres_half(y1)
    cost, mv = lowres_inter_cost(lr1, lr0)
    icost = lowres_intra_cost(lr1)
    assert cost.shape == (4, 8) and icost.shape == (4, 8)
    # inner blocks should find the global motion (ties aside)
    inner = np.asarray(mv)[1:-1, 2:-2]
    assert np.median(inner[..., 0]) != 0
    # inter prediction must beat intra on a pure translation
    assert np.asarray(cost)[1:-1, 1:-1].mean() < \
        np.asarray(icost)[1:-1, 1:-1].mean()
