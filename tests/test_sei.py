"""SEI emission + verification: decoded-picture-hash (MD5/CRC/checksum)
round-trips through the decoder's hash check; HDR metadata SEIs parse."""

import numpy as np
import pytest

from x265amod_tpu.bitstream import sei
from x265amod_tpu.models.encoder import Encoder
from x265amod_tpu.utils.params import Param
from x265amod_tpu.verify.decoder import decode_stream


def _frames(w, h, n):
    rng = np.random.default_rng(7)
    out = []
    for t in range(n):
        y = (128 + 50 * np.sin((np.arange(h)[:, None] + t) / 5.0)
             + rng.normal(0, 4, (h, w))).clip(0, 255).astype(np.uint8)
        cb = np.full((h // 2, w // 2), 100 + 5 * t, np.uint8)
        cr = np.full((h // 2, w // 2), 140, np.uint8)
        out.append((y, cb, cr))
    return out


@pytest.mark.parametrize("hash_type", [1, 2, 3])
def test_decoded_picture_hash_roundtrip(hash_type):
    p = Param(width=48, height=32, qp=30, keyint=8, bframes=2,
              decoded_picture_hash=hash_type)
    enc = Encoder(p)
    stream = b""
    for fr in _frames(48, 32, 5):
        for out in enc.encode_push(*fr):
            stream += out.nals
    for out in enc.flush():
        stream += out.nals
    # decoder raises on any hash mismatch
    dec = decode_stream(stream)
    assert len(dec) == 5


def test_hash_detects_corruption():
    p = Param(width=48, height=32, qp=30, keyint=1,
              decoded_picture_hash=1)
    enc = Encoder(p)
    stream = b""
    for fr in _frames(48, 32, 1):
        for out in enc.encode_push(*fr):
            stream += out.nals
    # corrupt the hash SEI payload (last NAL): flip a digest byte
    bad = bytearray(stream)
    bad[-4] ^= 0xFF
    with pytest.raises(AssertionError):
        decode_stream(bytes(bad))


def test_hdr_metadata_sei_emitted():
    p = Param(width=48, height=32, qp=30, keyint=1,
              master_display="G(13250,34500)B(7500,3000)R(34000,16000)"
                             "WP(15635,16450)L(10000000,1)",
              max_cll=1000, max_fall=400, atc_sei=18)
    enc = Encoder(p)
    hdr = enc.headers()
    # mastering display (137), CLL (144), ATC (147) present in SEI NAL
    assert bytes([137]) in hdr and bytes([144]) in hdr
    stream = b""
    for fr in _frames(48, 32, 1):
        for out in enc.encode_push(*fr):
            stream += out.nals
    dec = decode_stream(stream)   # SEI parse must not break decoding
    assert len(dec) == 1


def test_mastering_display_string_parse():
    prim, wp, mx, mn = sei.parse_mastering_display_string(
        "G(13250,34500)B(7500,3000)R(34000,16000)WP(15635,16450)"
        "L(10000000,1)")
    assert prim[0] == (13250, 34500)
    assert wp == (15635, 16450)
    assert (mx, mn) == (10000000, 1)


def test_sei_payload_framing_large():
    # >255-byte payload exercises the ff-escape size coding
    payload = bytes(300)
    msg = sei._sei_message(5, payload)
    assert msg[0] == 5 and msg[1] == 255 and msg[2] == 45
