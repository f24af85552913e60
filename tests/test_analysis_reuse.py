"""Analysis save/load (reference --analysis-save/--analysis-load):
a load pass reusing the saved lookahead decisions must reproduce the
save pass's stream byte-identically (the reference save/load test
contract, test/save-load-tests.txt)."""

import numpy as np

from x265amod_tpu.analysis import AnalysisReader
from x265amod_tpu.models.encoder import Encoder
from x265amod_tpu.utils.params import Param


def _frames(w, h, n, seed=13):
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    out = []
    for t in range(n):
        if t == 4:   # scene change mid-sequence
            y = rng.integers(0, 255, (h, w)).astype(np.uint8)
        else:
            y = (128 + 50 * np.sin((xx + 2 * t) / 6.0)
                 + rng.normal(0, 5, (h, w))).clip(0, 255) \
                .astype(np.uint8)
        out.append((y, np.full((h // 2, w // 2), 100, np.uint8),
                    np.full((h // 2, w // 2), 150, np.uint8)))
    return out


def _encode(p, frames):
    enc = Encoder(p)
    stream = b""
    for fr in frames:
        for out in enc.encode_push(*fr):
            stream += out.nals
    for out in enc.flush():
        stream += out.nals
    enc.close()
    return enc, stream


def test_save_then_load_reproduces_stream(tmp_path):
    w, h, n = 96, 64, 7
    af = str(tmp_path / "analysis.npz")
    frames = _frames(w, h, n)
    p1 = Param(width=w, height=h, qp=32, keyint=250, bframes=2,
               aq_mode=2, cutree=True, rc_lookahead=4, min_keyint=2,
               analysis_save=af)
    enc1, stream1 = _encode(p1, frames)

    rd = AnalysisReader(af)
    assert rd.level == 10 and rd.n_frames == n
    rec4 = rd.frame(4)
    assert rec4.is_scenecut, "scene cut at display 4 not recorded"
    assert rec4.qp_offsets is not None

    # load pass: lookahead bypassed entirely, decisions from the file
    p2 = Param(width=w, height=h, qp=32, keyint=250, bframes=2,
               aq_mode=2, cutree=True, rc_lookahead=4, min_keyint=2,
               analysis_load=af)
    enc2, stream2 = _encode(p2, frames)
    assert enc2.lookahead is None
    assert stream2 == stream1, "load pass diverged from save pass"

    # sanity: a pass without the offsets produces a different stream
    p3 = Param(width=w, height=h, qp=32, keyint=250, bframes=2)
    _, stream3 = _encode(p3, frames)
    assert stream3 != stream1


def test_level10_records_cu_data(tmp_path):
    w, h, n = 64, 48, 4
    af = str(tmp_path / "a.npz")
    p = Param(width=w, height=h, qp=32, keyint=250, bframes=0,
              aq_mode=1, rc_lookahead=2, analysis_save=af,
              analysis_reuse_level=10)
    _encode(p, _frames(w, h, n))
    rd = AnalysisReader(af)
    rec = rd.frame(1)
    assert rec.kinds is not None and rec.kinds.shape == (h // 16,
                                                         w // 16)


def test_level10_load_skips_mode_search(tmp_path, monkeypatch):
    """Level-10 consumption (reference readAnalysisFile semantics,
    encoder.cpp:4439): the load pass feeds recorded split + intra
    modes to the single-mode dispatch path and reproduces the save
    pass's stream bit-exactly WITHOUT running the mode search."""
    w, h, n = 96, 64, 3
    frames = _frames(w, h, n)
    af = str(tmp_path / "cu.npz")
    p1 = Param(width=w, height=h, qp=32, keyint=1, ctu_size=32,
               analysis_save=af, analysis_reuse_level=10)
    enc1, stream1 = _encode(p1, frames)
    rd = AnalysisReader(af)
    rec = rd.frame(0)
    assert rec.split is not None and rec.modes is not None

    import x265amod_tpu.models.intra_tree as it
    calls = {"load": 0}
    real = it.IntraTreeEncoder.encode_async_load

    def spy(self, *a, **k):
        calls["load"] += 1
        return real(self, *a, **k)
    monkeypatch.setattr(it.IntraTreeEncoder, "encode_async_load", spy)

    p2 = Param(width=w, height=h, qp=32, keyint=1, ctu_size=32,
               analysis_load=af)
    enc2, stream2 = _encode(p2, frames)
    assert calls["load"] == n, "load path never engaged"
    assert stream2 == stream1, "level-10 load diverged from save pass"
