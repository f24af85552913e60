"""Scaler, ABR-ladder app, and script-reader gating (reference
common/scaler.cpp, abrEncApp.cpp, input/avs.cpp, input/vpy.cpp)."""

import os

import numpy as np
import pytest

from x265amod_tpu.ops.scaler import (_resample_matrix, resample_frame,
                                     resample_plane)


def test_resample_matrix_rows_sum_to_one():
    for (s, d) in ((64, 32), (32, 64), (48, 36), (7, 7)):
        for m in ("bicubic", "bilinear"):
            mat = _resample_matrix(s, d, m)
            assert mat.shape == (d, s)
            np.testing.assert_allclose(mat.sum(1), 1.0, atol=1e-5)


def test_resample_constant_plane_is_exact():
    pl = np.full((64, 96), 137, np.uint8)
    out = resample_plane(pl, 48, 32)
    assert out.shape == (32, 48)
    assert (out == 137).all()


def test_resample_downscale_preserves_gradient():
    xx = np.tile(np.arange(128, dtype=np.uint8), (64, 1))
    out = resample_plane(xx, 64, 32)
    # columns should remain monotonically increasing
    d = np.diff(out[16].astype(int))
    assert (d >= 0).all()
    assert out[16, -1] > out[16, 0] + 100


def test_resample_frame_420():
    y = np.random.default_rng(0).integers(0, 255, (64, 96)) \
        .astype(np.uint8)
    cb = np.full((32, 48), 90, np.uint8)
    cr = np.full((32, 48), 180, np.uint8)
    oy, ocb, ocr = resample_frame((y, cb, cr), 48, 32)
    assert oy.shape == (32, 48) and ocb.shape == (16, 24)


def test_abr_ladder_end_to_end(tmp_path):
    from x265amod_tpu.abr import main, parse_ladder_config
    w, h, n = 96, 64, 4
    rng = np.random.default_rng(2)
    y4m = tmp_path / "in.y4m"
    with open(y4m, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode())
        for t in range(n):
            yy = (128 + 60 * np.sin((np.arange(w)[None, :] + t) / 7.0)
                  + rng.normal(0, 4, (h, w))).clip(0, 255) \
                .astype(np.uint8)
            f.write(b"FRAME\n")
            f.write(yy.tobytes())
            f.write(np.full((h // 2, w // 2), 100, np.uint8).tobytes())
            f.write(np.full((h // 2, w // 2), 150, np.uint8).tobytes())
    cfg = tmp_path / "ladder.cfg"
    cfg.write_text(
        "full:96x64:400:bframes=0\n"
        "half:48x32:120:bframes=0 keyint=2\n")
    rungs = parse_ladder_config(str(cfg))
    assert rungs[1].extra == ["bframes=0", "keyint=2"]
    prefix = str(tmp_path / "out")
    rc = main([str(y4m), "--ladder", str(cfg), "--output-prefix",
               prefix, "--preset", "ultrafast"])
    assert rc == 0
    from x265amod_tpu.verify.decoder import decode_stream
    for name, (dw, dh) in (("full", (96, 64)), ("half", (48, 32))):
        stream = open(f"{prefix}_{name}.hevc", "rb").read()
        dec = decode_stream(stream)
        assert len(dec) == n
        assert dec[0].y.shape == (dh, dw)


def test_avs_reader_gates_cleanly(tmp_path):
    from x265amod_tpu.io.avs import AvsReader, AvsUnavailableError
    script = tmp_path / "t.avs"
    script.write_text('Version()')
    with pytest.raises((AvsUnavailableError, FileNotFoundError)):
        AvsReader(str(script))
    with pytest.raises(FileNotFoundError):
        AvsReader(str(tmp_path / "missing.avs"))


def test_vpy_reader_gates_cleanly(tmp_path):
    from x265amod_tpu.io.vpy import VpyReader, VpyUnavailableError
    script = tmp_path / "t.vpy"
    script.write_text("clip = None")
    try:
        import vapoursynth  # noqa: F401
        have_vs = True
    except ImportError:
        have_vs = False
    if not have_vs:
        with pytest.raises(VpyUnavailableError):
            VpyReader(str(script))
    with pytest.raises(FileNotFoundError):
        VpyReader(str(tmp_path / "missing.vpy"))


def test_reconplay_pipes_y4m(tmp_path):
    """ReconPlay (aMod --recon-y4m-exec, reference output/reconplay.cpp)
    must deliver a well-formed Y4M stream to the child command and
    survive the child dying mid-stream."""
    import numpy as np
    from x265amod_tpu.io.reconplay import ReconPlay
    out = tmp_path / "rp.y4m"
    rp = ReconPlay(f"cat > {out}", 32, 16, 25, 1)
    y = np.arange(32 * 16, dtype=np.uint8).reshape(16, 32)
    cb = np.full((8, 16), 100, np.uint8)
    cr = np.full((8, 16), 200, np.uint8)
    for _ in range(3):
        rp.write_frame(y, cb, cr)
    rp.close()
    data = out.read_bytes()
    assert data.startswith(b"YUV4MPEG2 W32 H16 F25:1")
    assert data.count(b"FRAME\n") == 3
    body = data.split(b"FRAME\n", 1)[1]
    assert np.array_equal(
        np.frombuffer(body[:32 * 16], np.uint8).reshape(16, 32), y)
    # dead child: writes must not raise
    rp2 = ReconPlay("exit 0", 32, 16, 25, 1)
    import time
    time.sleep(0.2)
    for _ in range(64):
        rp2.write_frame(y, cb, cr)
    rp2.close()


def test_avs_value_marshalling():
    """The AVS_Value ctypes mirror must match the C ABI layout
    (avisynth_c.h): 2+2 byte header + pointer-sized union."""
    import ctypes
    from x265amod_tpu.io.avs import AvsValue
    v = AvsValue.from_string("hello.avs")
    assert v.type == ord("s")
    assert v.d.string == b"hello.avs"
    assert not v.is_error and not v.is_clip
    # union starts at the pointer-aligned offset
    assert AvsValue.d.offset == ctypes.alignment(ctypes.c_void_p)
    assert ctypes.sizeof(AvsValue) == \
        ctypes.alignment(ctypes.c_void_p) + ctypes.sizeof(ctypes.c_void_p)
