"""CABAC arithmetic engine roundtrip tests.

The encoder (spec informative algorithm) and decoder (spec normative
algorithm) are independent formulations; agreement on random bin streams
is the conformance anchor for the arithmetic core.
"""

import numpy as np
import pytest

from x265amod_tpu.cabac.engine import CabacEncoder, CabacDecoder
from x265amod_tpu.cabac.tables import NUM_CTX, init_context_states


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("qp", [12, 27, 40])
def test_roundtrip_random_bins(seed, qp):
    rng = np.random.default_rng(seed)
    n = 5000
    kinds = rng.integers(0, 3, n)  # 0=ctx bin, 1=bypass, 2 reserved
    ctx_idx = rng.integers(0, NUM_CTX, n)
    # biased bins exercise MPS/LPS paths unevenly, like real syntax
    bins = (rng.random(n) < 0.7).astype(np.int32)

    enc = CabacEncoder()
    enc.init_contexts("I", qp)
    for k, c, b in zip(kinds, ctx_idx, bins):
        if k == 0:
            enc.encode_bin(int(c), int(b))
        else:
            enc.encode_bypass(int(b))
    enc.encode_terminate(1)
    data = enc.finish()

    dec = CabacDecoder(data, "I", qp)
    for i, (k, c, b) in enumerate(zip(kinds, ctx_idx, bins)):
        if k == 0:
            got = dec.decode_bin(int(c))
        else:
            got = dec.decode_bypass()
        assert got == b, f"bin {i} mismatch (kind={k})"
    assert dec.decode_terminate() == 1


def test_terminate_zero_bins_interleaved():
    enc = CabacEncoder()
    enc.init_contexts("I", 30)
    pattern = [0, 1, 1, 0, 1] * 20
    for i, b in enumerate(pattern):
        enc.encode_bin(i % NUM_CTX, b)
        enc.encode_terminate(0)  # end_of_slice_segment_flag=0 per CTU
    enc.encode_terminate(1)
    data = enc.finish()

    dec = CabacDecoder(data, "I", 30)
    for i, b in enumerate(pattern):
        assert dec.decode_bin(i % NUM_CTX) == b
        assert dec.decode_terminate() == 0
    assert dec.decode_terminate() == 1


def test_bypass_multibin():
    enc = CabacEncoder()
    enc.init_contexts("P", 22)
    values = [(5, 4), (1023, 10), (0, 3), (255, 8)]
    for v, n in values:
        enc.encode_bypass_bins(v, n)
    enc.encode_terminate(1)
    dec = CabacDecoder(enc.finish(), "P", 22)
    for v, n in values:
        assert dec.decode_bypass_bins(n) == v


def test_context_init_matches_spec_examples():
    # split_cu_flag I-slice initValues {139,141,157}: check derivation at
    # QP 26 produces valid (state, mps) pairs within range.
    st = init_context_states("I", 26)
    assert st.shape == (NUM_CTX, 2)
    assert (st[:, 0] >= 0).all() and (st[:, 0] <= 62).all()
    assert ((st[:, 1] == 0) | (st[:, 1] == 1)).all()
