"""End-to-end B-frame tests: hierarchical mini-GOP streams decode
bit-exactly through the conformance decoder (golden-bitstream strategy,
SURVEY.md §4 item 2)."""

import numpy as np
import pytest

from x265amod_tpu.models.encoder import Encoder
from x265amod_tpu.models.mvpred import (amvp_candidates_b_scalar,
                                        dist_scale_factor,
                                        merge_candidates_b_scalar,
                                        scale_mv)
from x265amod_tpu.utils.params import Param
from x265amod_tpu.verify.decoder import decode_stream


def synth_seq(w, h, n, seed=3):
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    base = (128 + 60 * np.sin(xx / 9.0) * np.cos(yy / 7.0))
    frames = []
    for t in range(n):
        # global pan + noise (exercises ME on both lists)
        y = np.roll(base, (t, 2 * t), axis=(0, 1)) + \
            rng.normal(0, 3, (h, w))
        y = y.clip(0, 255).astype(np.uint8)
        cb = (128 + 20 * np.sin((xx[::2, ::2] + 3 * t) / 13.0)) \
            .clip(0, 255).astype(np.uint8)
        cr = (128 - 20 * np.cos((yy[::2, ::2] - 2 * t) / 11.0)) \
            .clip(0, 255).astype(np.uint8)
        frames.append((y, cb, cr))
    return frames


def _roundtrip(w, h, nframes, bframes, keyint, qp=30):
    p = Param(width=w, height=h, qp=qp, keyint=keyint, bframes=bframes,
              deblock=False)
    enc = Encoder(p)
    frames = synth_seq(w, h, nframes)
    outs = []
    stream = b""
    for fr in frames:
        for out in enc.encode_push(*fr, return_recon=True):
            outs.append(out)
            stream += out.nals
    for out in enc.flush(return_recon=True):
        outs.append(out)
        stream += out.nals
    assert len(outs) == nframes
    dec = decode_stream(stream)
    assert len(dec) == nframes
    # decoder returns display order; sort encoder outputs the same way
    outs.sort(key=lambda o: o.stats.display_order)
    for i, (out, df) in enumerate(zip(outs, dec)):
        ry, rcb, rcr = out.recon
        assert np.array_equal(np.asarray(ry), df.y), \
            f"luma mismatch frame {i} ({out.stats.slice_type})"
        assert np.array_equal(np.asarray(rcb), df.cb), \
            f"cb mismatch frame {i}"
        assert np.array_equal(np.asarray(rcr), df.cr), \
            f"cr mismatch frame {i}"
    return outs, dec


def test_b_gop_roundtrip_bitexact():
    outs, dec = _roundtrip(96, 64, 9, bframes=3, keyint=250)
    types = [o.stats.slice_type for o in outs]
    assert types[0] == "I"
    assert "B" in types, f"no B frames encoded: {types}"
    # frames should be reasonable quality at QP30
    for o in outs:
        assert o.stats.psnr_y > 28.0, (o.stats.poc, o.stats.psnr_y)


def test_b_gop_with_idr_boundary():
    # keyint 4 forces a flush-minigop before each IDR
    outs, dec = _roundtrip(64, 48, 10, bframes=2, keyint=4)
    n_idr = sum(1 for o in outs if o.stats.slice_type == "I")
    assert n_idr == 3          # display 0, 4, 8


def test_bframes1_simple_pyramid():
    _roundtrip(64, 48, 6, bframes=1, keyint=250)


def test_dist_scale_factor():
    # same distance to target as to source -> identity 256
    assert dist_scale_factor(2, 1, 3) == -256   # mirrored, equal dist
    assert dist_scale_factor(4, 2, 0) == 128    # tb=2, td=4 -> half
    assert dist_scale_factor(2, 0, 4) == -256   # tb=2, td=-2 -> mirror
    assert dist_scale_factor(4, 0, 2) == 512    # tb=4, td=2 -> double
    mv = scale_mv((8, -8), 256)
    assert mv == (8, -8)       # identity scale keeps the MV
    assert scale_mv((8, 4), -256) == (-8, -4)


def test_merge_b_pruning_and_zero_fill():
    a1 = (1, (4, 0), (0, 0))
    b1 = (1, (4, 0), (0, 0))      # duplicate of a1 -> pruned
    cands = merge_candidates_b_scalar(a1, b1, None, None)
    assert cands[0] == (1, (4, 0), (0, 0))
    assert cands[1] == (3, (0, 0), (0, 0))   # zero-bi fill
    # different dir is a different candidate
    b1 = (3, (4, 0), (8, 0))
    cands = merge_candidates_b_scalar(a1, b1, None, None)
    assert cands[1] == (3, (4, 0), (8, 0))


def test_amvp_b_cross_list_scaling():
    # neighbor uses only L1; AMVP for L0 takes its L1 MV scaled
    a1 = (2, (0, 0), (8, 4))
    dsf = dist_scale_factor(2, 0, 4)   # tb = 2, td = -2 -> -256
    cands = amvp_candidates_b_scalar(a1, None, None, None, 0, dsf)
    assert cands[0] == scale_mv((8, 4), dsf)
    assert cands[0] == (-8, -4)
    # neighbor with L0 motion is taken as-is
    a1 = (1, (6, -2), (0, 0))
    cands = amvp_candidates_b_scalar(a1, None, None, None, 0, dsf)
    assert cands[0] == (6, -2)
