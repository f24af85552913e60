"""SEI message writers (role of reference `encoder/sei.{h,cpp}`).

Implements the SEI subset the reference emits most: decoded picture
hash (MD5/CRC/checksum, `frameencoder.cpp:1226`), mastering display
colour volume, content light level, user data unregistered, recovery
point, and alternative transfer characteristics.  Payload framing per
spec 7.3.5 (ff-byte escape for type/size).
"""

from __future__ import annotations

import hashlib
import struct

from .bitio import BitWriter
from .nal import NAL_PREFIX_SEI, NAL_SUFFIX_SEI, wrap_nal

# payload types (spec Annex D)
SEI_BUFFERING_PERIOD = 0
SEI_PIC_TIMING = 1
SEI_USER_DATA_UNREGISTERED = 5
SEI_RECOVERY_POINT = 6
SEI_ACTIVE_PARAMETER_SETS = 129
SEI_DECODED_PICTURE_HASH = 132
SEI_MASTERING_DISPLAY = 137
SEI_CONTENT_LIGHT_LEVEL = 144
SEI_ALTERNATIVE_TRANSFER = 147

HASH_MD5 = 0
HASH_CRC = 1
HASH_CHECKSUM = 2


def _payload_data(bw: BitWriter) -> bytes:
    """SEI payload extraction with payload alignment (spec 7.3.5:
    payload_bit_equal_to_one + zero padding when not byte aligned)."""
    if not bw.byte_aligned():
        bw.write(1, 1)
        bw.write_align_zero()
    return bw.data()


def _sei_message(payload_type: int, payload: bytes) -> bytes:
    out = bytearray()
    t = payload_type
    while t >= 255:
        out.append(255)
        t -= 255
    out.append(t)
    s = len(payload)
    while s >= 255:
        out.append(255)
        s -= 255
    out.append(s)
    out += payload
    return bytes(out)


def wrap_sei(messages: list[tuple[int, bytes]], suffix: bool = False,
             temporal_id: int = 0) -> bytes:
    """One SEI NAL carrying the given (type, payload) messages."""
    body = b"".join(_sei_message(t, p) for t, p in messages)
    bw = BitWriter()
    bw.append_bytes(body)
    bw.rbsp_trailing_bits()
    return wrap_nal(NAL_SUFFIX_SEI if suffix else NAL_PREFIX_SEI,
                    bw.data(), temporal_id=temporal_id)


# ---- HRD conformance SEI (D.2.2/D.2.3; reference SEIBP/SEIPT sei.h) -------

def buffering_period(initial_delay_90k: int,
                     initial_offset_90k: int) -> bytes:
    """buffering_period SEI (spec D.2.2), NAL HRD, one CPB, matching
    the SPS hrd_parameters written by headers._write_hrd_parameters
    (24-bit delay fields).  Delays in 90 kHz ticks."""
    bw = BitWriter()
    bw.write_ue(0)                      # bp_seq_parameter_set_id
    bw.write_flag(0)                    # irap_cpb_params_present_flag
    bw.write_flag(0)                    # concatenation_flag
    bw.write(0, 24)                     # au_cpb_removal_delay_delta-1
    bw.write(min(initial_delay_90k, (1 << 24) - 1), 24)
    bw.write(min(initial_offset_90k, (1 << 24) - 1), 24)
    return _payload_data(bw)


def pic_timing(au_cpb_removal_delay: int,
               pic_dpb_output_delay: int) -> bytes:
    """pic_timing SEI (spec D.2.3) with CpbDpbDelaysPresent and
    frame_field_info off (matches the emitted VUI)."""
    bw = BitWriter()
    bw.write(max(au_cpb_removal_delay - 1, 0) & ((1 << 24) - 1), 24)
    bw.write(pic_dpb_output_delay & ((1 << 24) - 1), 24)
    return _payload_data(bw)


# ---- decoded picture hash (D.2.19 / reference sei.h:240) -------------------

def _crc16(plane) -> int:
    crc = 0xFFFF
    for b in plane.tobytes():
        for bit in range(7, -1, -1):
            crc_msb = (crc >> 15) & 1
            crc = ((crc << 1) & 0xFFFF) | ((b >> bit) & 1)
            if crc_msb:
                crc ^= 0x1021
    # 16 zero bits flush
    for _ in range(16):
        crc_msb = (crc >> 15) & 1
        crc = (crc << 1) & 0xFFFF
        if crc_msb:
            crc ^= 0x1021
    return crc


def _checksum(plane) -> int:
    h, w = plane.shape
    cs = 0
    data = plane
    for y in range(h):
        row = data[y]
        for x in range(w):
            xor_mask = (x & 0xFF) ^ (y & 0xFF) ^ (x >> 8) ^ (y >> 8)
            cs = (cs + ((int(row[x]) & 0xFF) ^ xor_mask)) & 0xFFFFFFFF
    return cs


def decoded_picture_hash(planes, hash_type: int = HASH_MD5) -> bytes:
    """planes: (y, cb, cr) uint8 arrays at coded (padded) dimensions."""
    out = bytearray([hash_type])
    for pl in planes:
        if hash_type == HASH_MD5:
            out += hashlib.md5(pl.tobytes()).digest()
        elif hash_type == HASH_CRC:
            out += struct.pack(">H", _crc16(pl))
        else:
            out += struct.pack(">I", _checksum(pl))
    return bytes(out)


def parse_decoded_picture_hash(payload: bytes):
    """Returns (hash_type, [per-plane digests])."""
    ht = payload[0]
    size = {HASH_MD5: 16, HASH_CRC: 2, HASH_CHECKSUM: 4}[ht]
    rest = payload[1:]
    return ht, [rest[i * size:(i + 1) * size] for i in range(3)]


# ---- HDR static metadata ----------------------------------------------------

def mastering_display(primaries, white_point, max_lum: int,
                      min_lum: int) -> bytes:
    """primaries: 3x(x,y) in 0.00002 units (G,B,R order per spec),
    white_point: (x,y), luminance in 0.0001 cd/m2 units."""
    bw = BitWriter()
    for (x, y) in primaries:
        bw.write(x, 16)
        bw.write(y, 16)
    bw.write(white_point[0], 16)
    bw.write(white_point[1], 16)
    bw.write(max_lum, 32)
    bw.write(min_lum, 32)
    return _payload_data(bw)


def content_light_level(max_cll: int, max_fall: int) -> bytes:
    bw = BitWriter()
    bw.write(max_cll, 16)
    bw.write(max_fall, 16)
    return _payload_data(bw)


def parse_mastering_display_string(s: str):
    """Parse the x265 CLI format:
    G(x,y)B(x,y)R(x,y)WP(x,y)L(max,min)."""
    import re
    vals = [int(v) for v in re.findall(r"-?\d+", s)]
    if len(vals) != 10:
        raise ValueError("master-display needs 10 integers")
    g, b, r = (vals[0], vals[1]), (vals[2], vals[3]), (vals[4], vals[5])
    wp = (vals[6], vals[7])
    return [g, b, r], wp, vals[8], vals[9]


# ---- misc -------------------------------------------------------------------

X265AMOD_TPU_UUID = bytes.fromhex("2ca12c12d8e94bfaa6d0a8e04c9ed2a1")


def user_data_unregistered(text: bytes,
                           uuid: bytes = X265AMOD_TPU_UUID) -> bytes:
    assert len(uuid) == 16
    return uuid + text


def recovery_point(poc_cnt: int, exact_match: bool = True,
                   broken_link: bool = False) -> bytes:
    bw = BitWriter()
    bw.write_se(poc_cnt)
    bw.write_flag(1 if exact_match else 0)
    bw.write_flag(1 if broken_link else 0)
    return _payload_data(bw)


def alternative_transfer(preferred_tc: int) -> bytes:
    bw = BitWriter()
    bw.write(preferred_tc, 8)
    return _payload_data(bw)


def active_parameter_sets() -> bytes:
    bw = BitWriter()
    bw.write(0, 4)       # active_video_parameter_set_id
    bw.write_flag(1)     # self_contained_cvs_flag
    bw.write_flag(0)     # no_parameter_set_update_flag
    bw.write_ue(0)       # num_sps_ids_minus1
    bw.write_ue(0)       # active_seq_parameter_set_id[0]
    return _payload_data(bw)
