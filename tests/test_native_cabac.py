"""Native C++ CABAC finalizer vs Python oracle: byte-identical output."""

import numpy as np
import pytest

from x265amod_tpu.cabac.engine import CabacEncoder
from x265amod_tpu.cabac.syntax import encode_intra_ctu16
from x265amod_tpu.native import encode_islice_ctu16, get_cabac_lib


def _python_slice(modes, ly, lcb, lcr, qp):
    enc = CabacEncoder()
    enc.init_contexts("I", qp)
    hc, wc = modes.shape
    for cy in range(hc):
        for cx in range(wc):
            left = int(modes[cy, cx - 1]) if cx > 0 else 1
            encode_intra_ctu16(enc, int(modes[cy, cx]), ly[cy, cx],
                               lcb[cy, cx], lcr[cy, cx], left, 1)
            enc.encode_terminate(
                1 if (cy == hc - 1 and cx == wc - 1) else 0)
    return enc.finish()


@pytest.mark.skipif(get_cabac_lib() is None, reason="no native toolchain")
@pytest.mark.parametrize("seed,qp", [(0, 22), (1, 32), (2, 45), (3, 8)])
def test_native_matches_python(seed, qp):
    rng = np.random.default_rng(seed)
    hc, wc = 4, 6
    modes = rng.integers(0, 35, (hc, wc)).astype(np.int32)
    def levels(n, density):
        lv = rng.integers(-50, 51, (hc, wc, n, n)).astype(np.int32)
        lv *= (rng.random((hc, wc, n, n)) < density)
        return lv
    ly = levels(16, 0.08)
    lcb = levels(8, 0.1)
    lcr = levels(8, 0.05)
    # include some all-zero and extreme blocks
    ly[0, 0] = 0
    ly[1, 1, 0, 0] = 32767
    lcb[0, 1] = 0
    ref = _python_slice(modes, ly, lcb, lcr, qp)
    got = encode_islice_ctu16(modes, ly, lcb, lcr, qp)
    assert got == ref, (
        f"native/python mismatch: {len(got)} vs {len(ref)} bytes, first "
        f"diff at {next((i for i, (a, b) in enumerate(zip(got, ref)) if a != b), -1)}")
