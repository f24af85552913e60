"""Intra prediction: batched JAX kernel vs scalar spec oracle
(checkasm analog for the intra family, SURVEY.md §2.1)."""

import numpy as np
import pytest

from x265amod_tpu.ops.intra import predict_all_modes_batch, substitute_refs
from x265amod_tpu.ops.intra_ref import (predict_all_modes,
                                        ref_sample_substitution)


@pytest.mark.parametrize("n,c_idx", [(16, 0), (8, 1), (8, 0), (4, 0),
                                     (32, 0)])
def test_batch_matches_oracle(n, c_idx):
    rng = np.random.default_rng(n * 10 + c_idx)
    bsz = 7
    top = rng.integers(0, 256, (bsz, 2 * n)).astype(np.int32)
    left = rng.integers(0, 256, (bsz, 2 * n)).astype(np.int32)
    corner = rng.integers(0, 256, bsz).astype(np.int32)
    got = np.asarray(predict_all_modes_batch(top, left, corner, n, c_idx))
    for b in range(bsz):
        ref = predict_all_modes(top[b], left[b], corner[b], n, c_idx)
        np.testing.assert_array_equal(got[b], ref, err_msg=f"batch {b}")


def test_substitution_matches_oracle_grid_cases():
    """All availability cases of the CTU-grid wavefront."""
    n = 16
    w_ctbs = 4
    rng = np.random.default_rng(0)
    cases = [(0, 0), (1, 0), (0, 1), (1, 1), (w_ctbs - 1, 1), (2, 2)]
    cx = np.array([c[0] for c in cases], dtype=np.int32)
    cy = np.array([c[1] for c in cases], dtype=np.int32)
    bsz = len(cases)
    top_raw = rng.integers(0, 256, (bsz, 2 * n)).astype(np.int32)
    left_raw = rng.integers(0, 256, (bsz, 2 * n)).astype(np.int32)
    corner_raw = rng.integers(0, 256, bsz).astype(np.int32)
    got_t, got_l, got_c = (np.asarray(a) for a in substitute_refs(
        top_raw, left_raw, corner_raw, cx, cy, n, w_ctbs))
    for b, (x, y) in enumerate(cases):
        at = np.zeros(2 * n, bool)
        at[:n] = y > 0
        at[n:] = y > 0 and x < w_ctbs - 1
        al = np.zeros(2 * n, bool)
        al[:n] = x > 0
        rt, rl, rc = ref_sample_substitution(
            top_raw[b], left_raw[b], int(corner_raw[b]), at, al,
            x > 0 and y > 0)
        np.testing.assert_array_equal(got_t[b], rt, err_msg=f"top {x},{y}")
        np.testing.assert_array_equal(got_l[b], rl, err_msg=f"left {x},{y}")
        assert got_c[b] == rc, f"corner {x},{y}"


@pytest.mark.parametrize("n,c_idx", [(16, 0), (8, 1), (8, 0), (4, 0),
                                     (32, 0), (16, 1)])
def test_single_mode_matches_all_modes(n, c_idx):
    """predict_modes_batch (single-mode commit path) must equal the
    all-modes kernel's slice at that mode for every mode 0..34."""
    from x265amod_tpu.ops.intra import predict_modes_batch
    rng = np.random.default_rng(100 + n * 10 + c_idx)
    bsz = 70  # every mode twice
    top = rng.integers(0, 256, (bsz, 2 * n)).astype(np.int32)
    left = rng.integers(0, 256, (bsz, 2 * n)).astype(np.int32)
    corner = rng.integers(0, 256, bsz).astype(np.int32)
    modes = np.arange(bsz, dtype=np.int32) % 35
    allp = np.asarray(predict_all_modes_batch(top, left, corner, n, c_idx))
    got = np.asarray(predict_modes_batch(top, left, corner, modes, n,
                                         c_idx))
    for b in range(bsz):
        np.testing.assert_array_equal(
            got[b], allp[b, modes[b]], err_msg=f"mode {modes[b]} n={n}")
