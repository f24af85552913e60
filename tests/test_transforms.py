"""Checkasm-analog tests: JAX transform kernels vs numpy oracle vs spec.

Mirrors the reference's `test/mbdstharness.cpp` strategy: randomized
inputs, exact integer comparison (SURVEY.md §4.1).
"""

import numpy as np
import pytest

from x265amod_tpu.ops.transforms import (DST4, dct_matrix, fwd_transform,
                                         fwd_transform_np, inv_transform,
                                         inv_transform_np)
from x265amod_tpu.ops.quant import (chroma_qp, dequant, dequant_np, quant,
                                    quant_np)


def test_dct_matrices_match_spec():
    # Spot-check normative transMatrix values (ITU-T H.265 8.6.4.2).
    t4 = dct_matrix(4)
    assert t4.tolist() == [[64, 64, 64, 64], [83, 36, -36, -83],
                           [64, -64, -64, 64], [36, -83, 83, -36]]
    t8 = dct_matrix(8)
    assert t8[1].tolist() == [89, 75, 50, 18, -18, -50, -75, -89]
    assert t8[3].tolist() == [75, -18, -89, -50, 50, 89, 18, -75]
    t16 = dct_matrix(16)
    assert t16[1].tolist() == [90, 87, 80, 70, 57, 43, 25, 9,
                               -9, -25, -43, -57, -70, -80, -87, -90]
    t32 = dct_matrix(32)
    assert t32[1][:16].tolist() == [90, 90, 88, 85, 82, 78, 73, 67,
                                    61, 54, 46, 38, 31, 22, 13, 4]
    assert t32[31][0] == 4 and t32[31][31] == -4
    # all rows of all sizes are subsampled rows of T32
    for n in (4, 8, 16):
        step = 32 // n
        assert (dct_matrix(n) == t32[::step, :n]).all()


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("seed", [0, 7])
def test_jax_matches_numpy_fwd_inv(n, seed):
    rng = np.random.default_rng(seed)
    batch = 5
    resi = rng.integers(-255, 256, (batch, n, n)).astype(np.int32)
    ref_f = np.stack([fwd_transform_np(r) for r in resi])
    got_f = np.asarray(fwd_transform(resi))
    np.testing.assert_array_equal(got_f, ref_f)
    ref_i = np.stack([inv_transform_np(c) for c in ref_f])
    got_i = np.asarray(inv_transform(got_f))
    np.testing.assert_array_equal(got_i, ref_i)


def test_dst4():
    rng = np.random.default_rng(3)
    resi = rng.integers(-255, 256, (2, 4, 4)).astype(np.int32)
    ref = np.stack([fwd_transform_np(r, use_dst=True) for r in resi])
    got = np.asarray(fwd_transform(resi, use_dst=True))
    np.testing.assert_array_equal(got, ref)
    back = np.asarray(inv_transform(got, use_dst=True))
    ref_b = np.stack([inv_transform_np(c, use_dst=True) for c in ref])
    np.testing.assert_array_equal(back, ref_b)


def test_transform_roundtrip_accuracy():
    # lossless-ish at QP 4: inverse(forward) should be close to input
    rng = np.random.default_rng(11)
    resi = rng.integers(-200, 201, (8, 16, 16)).astype(np.int32)
    coeff = np.asarray(fwd_transform(resi))
    back = np.asarray(inv_transform(coeff))
    err = np.abs(back - resi)
    assert err.max() <= 2, err.max()


@pytest.mark.parametrize("qp", [0, 10, 22, 37, 51])
@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_quant_dequant_match_numpy(qp, n):
    rng = np.random.default_rng(qp * 7 + n)
    coeff = rng.integers(-30000, 30001, (4, n, n)).astype(np.int32)
    ref_q = quant_np(coeff, qp)
    got_q = np.asarray(quant(coeff, qp))
    np.testing.assert_array_equal(got_q, ref_q)
    ref_d = dequant_np(ref_q, qp)
    got_d = np.asarray(dequant(got_q, qp))
    np.testing.assert_array_equal(got_d, ref_d)


def test_quant_traced_qp_matches_static():
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    coeff = rng.integers(-3000, 3001, (2, 16, 16)).astype(np.int32)
    for qp in (17, 33):
        a = np.asarray(quant(coeff, qp))
        b = np.asarray(quant(jnp.asarray(coeff), jnp.int32(qp)))
        np.testing.assert_array_equal(a, b)
        da = np.asarray(dequant(a, qp))
        db = np.asarray(dequant(jnp.asarray(a), jnp.int32(qp)))
        np.testing.assert_array_equal(da, db)


def test_chroma_qp_table():
    assert chroma_qp(20) == 20
    assert chroma_qp(30) == 29
    assert chroma_qp(43) == 37
    assert chroma_qp(45) == 39
    assert chroma_qp(51) == 45
