"""Public API facade (x265_* call surface parity)."""

import numpy as np
import pytest

from x265amod_tpu import api


def test_api_get_dispatch():
    a = api.api_get(8)
    assert a.bit_depth == 8 and a.build == api.BUILD
    a10 = api.api_get(10)              # Main10 built (round 5)
    assert a10.bit_depth == 10 and a10.build == api.BUILD
    with pytest.raises(NotImplementedError):
        api.api_get(12)


def test_full_api_encode_flow():
    a = api.api_get()
    p = a.param_default()
    a.param_parse(p, "input-res", "64x48")
    a.param_parse(p, "fps", "25")
    a.param_parse(p, "qp", 30)
    a.param_parse(p, "keyint", 4)
    a.param_parse(p, "bframes", 0)
    a.param_apply_profile(p, "main")
    enc = a.encoder_open(p)
    hdr = enc.headers()
    assert hdr.startswith(b"\x00\x00\x00\x01")
    rng = np.random.default_rng(1)
    stream = b""
    n_out = 0
    for t in range(3):
        pic = api.Picture(
            y=(128 + rng.normal(0, 20, (48, 64))).clip(0, 255)
            .astype(np.uint8),
            cb=np.full((24, 32), 100, np.uint8),
            cr=np.full((24, 32), 150, np.uint8))
        for nals, pout in enc.encode(pic):
            stream += nals
            n_out += 1
            assert pout.slice_type in ("I", "P", "B")
    for nals, _ in enc.encode(None):     # flush
        stream += nals
        n_out += 1
    assert n_out == 3
    s = enc.stats()
    assert s["frames"] == 3
    enc.close()
    from x265amod_tpu.verify.decoder import decode_stream
    assert len(decode_stream(stream)) == 3


def test_reconfig_safe_subset():
    a = api.api_get()
    p = a.param_default()
    p.width, p.height = 32, 32
    p.keyint = 1
    enc = a.encoder_open(p)
    enc.reconfig(qp=40)
    with pytest.raises(ValueError):
        enc.reconfig(width=64)


def test_mainstillpicture_profile():
    p = api.param_default()
    api.param_apply_profile(p, "mainstillpicture")
    assert p.keyint == 1
