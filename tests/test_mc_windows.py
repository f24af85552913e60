"""Gather-free MC window path (ops/me.py _block_windows) must be
bit-identical to the dynamic-gather path for bounded MVs."""

import numpy as np
import pytest

from x265amod_tpu.ops.me import (mc_chroma_qpel14, mc_luma_qpel14,
                                 subpel_refine)


def _ref(rng, h, w):
    return rng.integers(0, 256, (h, w)).astype(np.int32)


@pytest.mark.smoke
@pytest.mark.parametrize("n", [16, 32])
def test_luma_qpel_windows_match(n):
    rng = np.random.default_rng(3 + n)
    h, w = 96, 128
    ref = _ref(rng, h, w)
    nb = (h // n) * (w // n)
    mv = rng.integers(-16 * 4, 16 * 4 + 1, (nb, 2)).astype(np.int32)
    a = np.asarray(mc_luma_qpel14(ref, mv, n))
    b = np.asarray(mc_luma_qpel14(ref, mv, n, max_mv=18))
    np.testing.assert_array_equal(a, b)


@pytest.mark.smoke
def test_chroma_qpel_windows_match():
    rng = np.random.default_rng(11)
    h, w = 48, 64
    ref = _ref(rng, h, w)
    nb = (h // 8) * (w // 8)
    mv = rng.integers(-16 * 4, 16 * 4 + 1, (nb, 2)).astype(np.int32)
    a = np.asarray(mc_chroma_qpel14(ref, mv, 8))
    b = np.asarray(mc_chroma_qpel14(ref, mv, 8, max_mv=10))
    np.testing.assert_array_equal(a, b)


@pytest.mark.smoke
def test_subpel_refine_windows_match():
    rng = np.random.default_rng(7)
    h, w = 96, 128
    ref = _ref(rng, h, w)
    hc, wc = h // 16, w // 16
    cur = rng.integers(0, 256, (hc, wc, 16, 16)).astype(np.int32)
    mv = rng.integers(-16, 17, (hc * wc, 2)).astype(np.int32)
    lam = np.full((hc * wc,), 20.0, np.float32)
    mv_a, ssd_a = (np.asarray(x) for x in
                   subpel_refine(ref, cur, mv, lam[:, None], 16))
    mv_b, ssd_b = (np.asarray(x) for x in
                   subpel_refine(ref, cur, mv, lam[:, None], 16,
                                 max_mv=16))
    np.testing.assert_array_equal(mv_a, mv_b)
    np.testing.assert_array_equal(ssd_a, ssd_b)
