"""Inter-frame deblocking: per-edge bS derivation (spec 8.7.2.4),
jax-vs-numpy kernel equality, and bit-exact e2e roundtrips with
deblocking enabled on P and B slices."""

import numpy as np

from x265amod_tpu.ops.deblock import (bs_maps, deblock_chroma_bs,
                                      deblock_chroma_bs_np,
                                      deblock_luma_bs,
                                      deblock_luma_bs_np)
from x265amod_tpu.models.encoder import Encoder
from x265amod_tpu.utils.params import Param
from x265amod_tpu.verify.decoder import decode_stream


def test_bs_maps_rules():
    intra = np.array([[True, False], [False, False]])
    cbf = np.array([[False, False], [False, True]])
    dir_ = np.array([[0, 1], [1, 3]])
    mv0 = np.zeros((2, 2, 2), np.int32)
    mv0[1, 0] = (8, 0)     # differs by >= 4 qpel from (0,0)? vs [1,1]
    mv1 = np.zeros((2, 2, 2), np.int32)
    bs_v, bs_h = bs_maps(intra, cbf, dir_, mv0, mv1, xp=np)
    assert bs_v.shape == (2, 1) and bs_h.shape == (1, 2)
    assert bs_v[0, 0] == 2            # intra side
    # row 1: dir 1 vs dir 3 -> different ref sets -> bs 1
    assert bs_v[1, 0] == 1
    # col 0: intra above -> 2 ; col 1: cbf below -> 1
    assert bs_h[0, 0] == 2 and bs_h[0, 1] == 1
    # identical motion, no cbf -> 0
    same = np.zeros((1, 2, 2), np.int32)
    bs_v2, _ = bs_maps(np.zeros((1, 2), bool), np.zeros((1, 2), bool),
                       np.ones((1, 2), np.int32), same,
                       np.zeros_like(same), xp=np)
    assert bs_v2[0, 0] == 0
    # small MV difference (< 4 qpel) -> 0; large -> 1
    mv = np.zeros((1, 2, 2), np.int32)
    mv[0, 1] = (3, 0)
    bs_v3, _ = bs_maps(np.zeros((1, 2), bool), np.zeros((1, 2), bool),
                       np.ones((1, 2), np.int32), mv,
                       np.zeros_like(mv), xp=np)
    assert bs_v3[0, 0] == 0
    mv[0, 1] = (4, 0)
    bs_v4, _ = bs_maps(np.zeros((1, 2), bool), np.zeros((1, 2), bool),
                       np.ones((1, 2), np.int32), mv,
                       np.zeros_like(mv), xp=np)
    assert bs_v4[0, 0] == 1


def test_deblock_bs_jax_matches_numpy():
    rng = np.random.default_rng(8)
    h, w = 64, 96
    hc, wc = h // 16, w // 16
    plane = rng.integers(0, 256, (h, w)).astype(np.int32)
    bs_v = rng.integers(0, 3, (hc, wc - 1)).astype(np.int32)
    bs_h = rng.integers(0, 3, (hc - 1, wc)).astype(np.int32)
    for qp in (22, 32, 45):
        a = np.asarray(deblock_luma_bs(plane, qp, bs_v, bs_h))
        b = deblock_luma_bs_np(plane, qp, bs_v, bs_h)
        np.testing.assert_array_equal(a, b, err_msg=f"luma qp {qp}")
    cpl = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int32)
    for qp in (25, 39):
        a = np.asarray(deblock_chroma_bs(cpl, qp, bs_v, bs_h))
        b = deblock_chroma_bs_np(cpl, qp, bs_v, bs_h)
        np.testing.assert_array_equal(a, b, err_msg=f"chroma qp {qp}")


def _frames(w, h, n, seed=21):
    rng = np.random.default_rng(seed)
    big = (128 + 55 * np.sin(np.arange(h * 2)[:, None] / 8.0)
           * np.cos(np.arange(w * 2)[None, :] / 6.0)
           + rng.normal(0, 5, (h * 2, w * 2))).clip(0, 255) \
        .astype(np.uint8)
    out = []
    for t in range(n):
        y = big[t:t + h, 2 * t:2 * t + w]
        cb = (110 + (big[t:t + h:2, 2 * t:2 * t + w:2]
                     .astype(int) - 128) // 4).clip(0, 255) \
            .astype(np.uint8)
        cr = np.full((h // 2, w // 2), 135, np.uint8)
        out.append((y, cb, cr))
    return out


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
        assert np.array_equal(np.asarray(out.recon[1]), df.cb), \
            f"frame {i} cb"
        assert np.array_equal(np.asarray(out.recon[2]), df.cr), \
            f"frame {i} cr"
    return outs


def test_deblock_p_roundtrip():
    w, h = 96, 64
    p = Param(width=w, height=h, qp=33, keyint=250, bframes=0,
              deblock=True)
    _roundtrip(p, _frames(w, h, 4))


def test_deblock_b_roundtrip():
    w, h = 96, 64
    p = Param(width=w, height=h, qp=33, keyint=250, bframes=2,
              deblock=True)
    outs = _roundtrip(p, _frames(w, h, 6))
    assert {"I", "P", "B"} <= {o.stats.slice_type for o in outs}


def test_deblock_with_sao_roundtrip():
    w, h = 96, 64
    p = Param(width=w, height=h, qp=35, keyint=250, bframes=0,
              deblock=True, sao=True)
    _roundtrip(p, _frames(w, h, 3))
