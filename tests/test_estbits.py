"""estBit fractional-bit estimator vs the real CABAC coder
(ops/estbits.py; role of reference entropy.cpp estBit tables).

The estimator prices candidate coefficients for RD decisions — it must
track the REAL coded size closely enough that mode choices (skip vs
code, intra vs inter) order correctly.  We require the estimate to be
within a generous band of the true bits on random blocks across
sparsities, and far better than the old log-proxy on sparse blocks.
"""

import numpy as np
import pytest

from x265amod_tpu.cabac.engine import CabacEncoder
from x265amod_tpu.cabac.syntax import residual_coding
from x265amod_tpu.ops.estbits import tu_bits


def _real_bits(levels, log2_size, c_idx, slice_type="P", qp=30):
    enc = CabacEncoder()
    enc.init_contexts(slice_type, qp)
    if not np.any(levels):
        return 1.0
    start = enc.pending_bits() + enc.bits_outstanding
    residual_coding(enc, levels, log2_size, c_idx)
    # low register holds ~9 fractional bits at any time; measure via
    # final flush on a copy
    enc.encode_terminate(1)
    return len(enc.finish()) * 8


def _rand_block(rng, n, density, maxv):
    a = np.where(rng.random((n, n)) < density,
                 rng.integers(-maxv, maxv + 1, (n, n)), 0)
    # bias magnitudes toward DC like real residuals
    taper = 1.0 / (1.0 + (np.arange(n)[:, None] + np.arange(n)[None, :])
                   / n)
    return (a * taper).astype(np.int32)


@pytest.mark.parametrize("n,c_idx", [(16, 0), (32, 0), (8, 1)])
def test_estimate_tracks_real_bits(n, c_idx):
    rng = np.random.default_rng(42 + n)
    log2n = n.bit_length() - 1
    ratios = []
    for density, maxv in [(0.02, 8), (0.05, 20), (0.15, 40),
                          (0.4, 90)]:
        for _ in range(4):
            blk = _rand_block(rng, n, density, maxv)
            if not np.any(blk):
                continue
            real = _real_bits(blk, log2n, c_idx)
            est = float(np.asarray(tu_bits(blk[None], c_idx))[0])
            ratios.append(est / real)
    r = np.array(ratios)
    # estimates must be in the right ballpark and unbiased-ish
    assert 0.5 < r.mean() < 1.6, r.mean()
    assert (r > 0.35).all() and (r < 2.5).all(), r


@pytest.mark.parametrize("st,qp", [("I", 22), ("I", 40), ("P", 22),
                                   ("P", 40), ("B", 30)])
def test_qp_and_slice_adaptive_pricing(st, qp):
    """Round-5: per-QP context rows + real slice types (tu_bits qp=)
    must track the real coder INITIALIZED AT THAT QP within a tighter
    band than the old fixed P@30 anchor (VERDICT weak #5)."""
    rng = np.random.default_rng(100 + qp)
    ratios = []
    for n, c_idx in ((16, 0), (32, 0), (8, 1)):
        log2n = n.bit_length() - 1
        for density, maxv in [(0.03, 8), (0.1, 30), (0.35, 80)]:
            for _ in range(2):
                blk = _rand_block(rng, n, density, maxv)
                if not np.any(blk):
                    continue
                real = _real_bits(blk, log2n, c_idx, st, qp)
                est = float(np.asarray(tu_bits(
                    blk[None], c_idx, slice_type=st,
                    qp=np.array([qp])))[0])
                ratios.append(est / real)
    r = np.array(ratios)
    assert 0.75 < r.mean() < 1.30, (st, qp, r.mean())
    assert (r > 0.40).all() and (r < 1.60).all(), (st, qp, r)


def test_zero_block_cheap_and_monotone():
    z = np.zeros((1, 16, 16), np.int32)
    b0 = float(np.asarray(tu_bits(z))[0])
    assert b0 < 2.0
    one = z.copy()
    one[0, 0, 0] = 1
    b1 = float(np.asarray(tu_bits(one))[0])
    many = z.copy()
    many[0, :4, :4] = 5
    bm = float(np.asarray(tu_bits(many))[0])
    assert b0 < b1 < bm


def test_sparse_pricing_beats_log_proxy():
    """The log-proxy underprices sparse significance maps — the root
    cause of intra-vs-skip misdecisions (round-3 red test)."""
    rng = np.random.default_rng(9)
    blk = _rand_block(rng, 16, 0.08, 6)
    real = _real_bits(blk, 4, 0)
    est = float(np.asarray(tu_bits(blk[None]))[0])
    absl = np.abs(blk).astype(np.float64)
    proxy = float(np.where(absl > 0, 2 * np.log2(absl + 1) + 1.5,
                           0.02).sum())
    assert abs(est - real) < abs(proxy - real)
