"""Checkasm analog for the Pallas kernels: the fused transform+quant
kernel must be bit-exact against the numpy C-primitive oracle on random
inputs across all TU sizes, per-block QPs, DST, and inter rounding
(SURVEY.md §4.1: testCorrectness(cprim, optprim) on randomized inputs).

Runs the kernel in Pallas interpret mode on the CPU test backend; the
same kernel compiles for TPU (exercised by the bench path).
"""

import numpy as np
import pytest

import x265amod_tpu.ops.pallas_kernels as pk
from x265amod_tpu.ops.quant import quant_np
from x265amod_tpu.ops.transforms import fwd_transform_np


@pytest.fixture(autouse=True)
def _interpret():
    old = pk._INTERPRET
    pk._INTERPRET = True
    yield
    pk._INTERPRET = old


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("intra", [True, False])
def test_fused_fwd_quant_matches_oracle(n, intra):
    import jax.numpy as jnp
    rng = np.random.default_rng(n * 7 + intra)
    b = 53                                  # non-multiple of the tile
    resi = rng.integers(-255, 256, (b, n, n)).astype(np.int32)
    qp = rng.integers(0, 52, (b,)).astype(np.int32)
    got = np.asarray(pk.fused_fwd_quant(jnp.asarray(resi),
                                        jnp.asarray(qp), intra=intra))
    want = np.stack([
        quant_np(fwd_transform_np(resi[i]), int(qp[i]), intra=intra)
        for i in range(b)])
    np.testing.assert_array_equal(got, want)


def test_fused_fwd_quant_dst4():
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    resi = rng.integers(-255, 256, (17, 4, 4)).astype(np.int32)
    qp = rng.integers(0, 52, (17,)).astype(np.int32)
    got = np.asarray(pk.fused_fwd_quant(jnp.asarray(resi),
                                        jnp.asarray(qp), use_dst=True))
    want = np.stack([
        quant_np(fwd_transform_np(resi[i], use_dst=True), int(qp[i]))
        for i in range(17)])
    np.testing.assert_array_equal(got, want)
