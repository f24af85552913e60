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


@pytest.mark.skipif(get_cabac_lib() is None, reason="no native toolchain")
@pytest.mark.parametrize("seed", [0, 5])
def test_native_pslice_matches_python(seed):
    from dataclasses import dataclass
    from x265amod_tpu.cabac.syntax import encode_inter_ctu16
    from x265amod_tpu.native import encode_pslice_ctu16

    rng = np.random.default_rng(seed)
    hc, wc = 3, 5

    @dataclass
    class Res:
        kinds: np.ndarray
        merge_idx: np.ndarray
        mvd: np.ndarray
        mvp_idx: np.ndarray
        modes: np.ndarray
        levels_y: np.ndarray
        levels_cb: np.ndarray
        levels_cr: np.ndarray

    def levels(n, density):
        lv = rng.integers(-40, 41, (hc, wc, n, n)).astype(np.int32)
        lv *= (rng.random((hc, wc, n, n)) < density)
        return lv
    res = Res(
        kinds=rng.integers(0, 3, (hc, wc)).astype(np.int32),
        merge_idx=rng.integers(0, 2, (hc, wc)).astype(np.int32),
        mvd=rng.integers(-70, 71, (hc, wc, 2)).astype(np.int32),
        mvp_idx=rng.integers(0, 2, (hc, wc)).astype(np.int32),
        modes=rng.integers(0, 35, (hc, wc)).astype(np.int32),
        levels_y=levels(16, 0.05), levels_cb=levels(8, 0.05),
        levels_cr=levels(8, 0.05))
    # force a few interesting cases
    res.kinds[0, 0] = 1
    res.levels_y[0, 0] = 0
    res.levels_cb[0, 0] = 0
    res.levels_cr[0, 0] = 0   # inter with rqt_root_cbf=0
    res.kinds[0, 1] = 0       # skip
    qp = 30

    enc = CabacEncoder()
    enc.init_contexts("P", qp)
    for cy in range(hc):
        for cx in range(wc):
            kind = int(res.kinds[cy, cx])
            ctu = {"kind": ("skip", "inter", "intra")[kind],
                   "merge_idx": int(res.merge_idx[cy, cx]),
                   "mvd": tuple(res.mvd[cy, cx]),
                   "mvp_idx": int(res.mvp_idx[cy, cx]),
                   "luma_mode": int(res.modes[cy, cx]),
                   "levels_y": res.levels_y[cy, cx],
                   "levels_cb": res.levels_cb[cy, cx],
                   "levels_cr": res.levels_cr[cy, cx]}
            ls = int(res.kinds[cy, cx - 1] == 0) if cx > 0 else 0
            as_ = int(res.kinds[cy - 1, cx] == 0) if cy > 0 else 0
            lim = int(res.modes[cy, cx - 1]) \
                if (cx > 0 and res.kinds[cy, cx - 1] == 2) else 1
            encode_inter_ctu16(enc, ctu, ls, as_, lim, 2)
            enc.encode_terminate(
                1 if (cy == hc - 1 and cx == wc - 1) else 0)
    ref = enc.finish()
    got = encode_pslice_ctu16(res, qp)
    assert got == ref


def test_native_bslice_byte_identical(monkeypatch):
    """The native B-slice serializer must produce byte-identical
    streams to the Python CABAC oracle."""
    import numpy as np
    import x265amod_tpu.native as native
    from x265amod_tpu.models.encoder import Encoder
    from x265amod_tpu.utils.params import Param

    if native.get_cabac_lib() is None:
        import pytest
        pytest.skip("native toolchain unavailable")

    rng = np.random.default_rng(31)
    w, h, n = 96, 64, 6
    frames = []
    base = (128 + 50 * np.sin(np.arange(h)[:, None] / 7.0)
            * np.cos(np.arange(w)[None, :] / 5.0))
    for t in range(n):
        y = (np.roll(base, 2 * t, axis=1)
             + rng.normal(0, 4, (h, w))).clip(0, 255).astype(np.uint8)
        frames.append((y, np.full((h // 2, w // 2), 100, np.uint8),
                       np.full((h // 2, w // 2), 150, np.uint8)))

    def encode_all():
        p = Param(width=w, height=h, qp=31, keyint=250, bframes=2)
        enc = Encoder(p)
        s = b""
        for fr in frames:
            for o in enc.encode_push(*fr):
                s += o.nals
        for o in enc.flush():
            s += o.nals
        return s

    stream_native = encode_all()
    monkeypatch.setattr(native, "encode_bslice_ctu16",
                        lambda *a, **k: None)
    monkeypatch.setattr(native, "encode_pslice_ctu16",
                        lambda *a, **k: None)
    monkeypatch.setattr(native, "encode_islice_ctu16",
                        lambda *a, **k: None)
    stream_python = encode_all()
    assert stream_native == stream_python
