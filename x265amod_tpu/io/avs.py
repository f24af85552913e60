"""AviSynth script reader (aMod addition; role of reference
`input/avs.{h,cpp}`).

Binds the AviSynth C API via ctypes the same way the reference binds
its function table with the AVS_DECLARE/LOAD_FUNC macros
(`avs.h:38-71`), and runs the reference reader's exact call sequence
(`avs.cpp` openfile + read loop):

    avs_create_script_environment -> avs_invoke("Import", script)
    [-> avs_invoke("ConvertToYV12") when the clip is not 4:2:0 8-bit]
    -> avs_take_clip -> avs_get_video_info
    -> per frame: avs_get_frame -> avs_get_read_ptr_p/avs_get_pitch_p
       per plane -> avs_release_video_frame

A clean `AvsUnavailableError` is raised when no AviSynth runtime
exists on the machine (this environment has none — the binding is
exercised by tests through the gating path; the invoke/read path runs
on any machine with a real install).

Output is normalized to 8-bit 4:2:0 planar (y, cb, cr) numpy frames,
matching the other readers.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
from dataclasses import dataclass

import numpy as np

_CANDIDATES = ("avisynth", "libavisynth.so", "libavisynth.so.0",
               "avisynth.dll")

# AVS C API constants (avisynth_c.h)
_AVS_PLANAR_Y = 1 << 0
_AVS_PLANAR_U = 1 << 1
_AVS_PLANAR_V = 1 << 2
_AVS_CS_YV12 = -1610612720      # planar 4:2:0 8-bit (0xA0000008)
_AVS_CS_I420 = -1610612688      # planar 4:2:0 8-bit, UV swapped


class AvsUnavailableError(RuntimeError):
    pass


@dataclass
class AvsInfo:
    width: int
    height: int
    fps_num: int
    fps_den: int
    num_frames: int


class _AvsValueU(ctypes.Union):
    _fields_ = [("clip", ctypes.c_void_p),
                ("boolean", ctypes.c_char),
                ("integer", ctypes.c_int),
                ("floating_pt", ctypes.c_float),
                ("string", ctypes.c_char_p),
                ("array", ctypes.c_void_p)]


class AvsValue(ctypes.Structure):
    """AVS_Value (avisynth_c.h): 16-bit type tag + payload union."""
    _fields_ = [("type", ctypes.c_short),
                ("array_size", ctypes.c_short),
                ("d", _AvsValueU)]

    @classmethod
    def from_string(cls, s: str) -> "AvsValue":
        v = cls()
        v.type = ord("s")
        v.d.string = s.encode()
        return v

    @property
    def is_error(self) -> bool:
        return self.type == ord("e")

    @property
    def is_clip(self) -> bool:
        return self.type == ord("c")

    def error_string(self) -> str:
        return (self.d.string or b"<no message>").decode(
            "utf-8", "replace")


class _AvsVideoInfo(ctypes.Structure):
    _fields_ = [("width", ctypes.c_int), ("height", ctypes.c_int),
                ("fps_numerator", ctypes.c_uint),
                ("fps_denominator", ctypes.c_uint),
                ("num_frames", ctypes.c_int),
                ("pixel_type", ctypes.c_int),
                ("audio_samples_per_second", ctypes.c_int),
                ("sample_type", ctypes.c_int),
                ("num_audio_samples", ctypes.c_int64),
                ("nchannels", ctypes.c_int),
                ("image_type", ctypes.c_int)]


def _load_library(explicit: str | None = None):
    names = ([explicit] if explicit else []) + list(_CANDIDATES)
    found = ctypes.util.find_library("avisynth")
    if found:
        names.append(found)
    for name in names:
        if not name:
            continue
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    raise AvsUnavailableError(
        "AviSynth runtime not found (looked for: "
        + ", ".join(n for n in names if n) + ")")


def _bind(lib):
    """Declare the prototypes of the API subset the reader uses (the
    reference's AVS_DECLARE/LOAD_FUNC table, avs.h:38-71)."""
    p = ctypes.c_void_p
    lib.avs_create_script_environment.restype = p
    lib.avs_create_script_environment.argtypes = [ctypes.c_int]
    lib.avs_invoke.restype = AvsValue
    lib.avs_invoke.argtypes = [p, ctypes.c_char_p, AvsValue,
                               ctypes.POINTER(ctypes.c_char_p)]
    lib.avs_take_clip.restype = p
    lib.avs_take_clip.argtypes = [AvsValue, p]
    lib.avs_release_value.argtypes = [AvsValue]
    lib.avs_get_video_info.restype = ctypes.POINTER(_AvsVideoInfo)
    lib.avs_get_video_info.argtypes = [p]
    lib.avs_get_frame.restype = p
    lib.avs_get_frame.argtypes = [p, ctypes.c_int]
    lib.avs_get_pitch_p.restype = ctypes.c_int
    lib.avs_get_pitch_p.argtypes = [p, ctypes.c_int]
    lib.avs_get_read_ptr_p.restype = ctypes.POINTER(ctypes.c_ubyte)
    lib.avs_get_read_ptr_p.argtypes = [p, ctypes.c_int]
    lib.avs_release_video_frame.argtypes = [p]
    lib.avs_release_clip.argtypes = [p]
    lib.avs_delete_script_environment.argtypes = [p]


class AvsReader:
    """Frame iterator over an .avs script (8-bit 4:2:0 output)."""

    def __init__(self, path: str, library: str | None = None):
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        self._lib = _load_library(library)
        _bind(self._lib)
        self._env = self._lib.avs_create_script_environment(3)
        if not self._env:
            raise AvsUnavailableError("avs_create_script_environment")
        arg = AvsValue.from_string(os.path.abspath(path))
        res = self._lib.avs_invoke(self._env, b"Import", arg, None)
        if res.is_error:
            msg = res.error_string()
            self._lib.avs_release_value(res)
            raise AvsUnavailableError(f"AviSynth Import failed: {msg}")
        if not res.is_clip:
            self._lib.avs_release_value(res)
            raise AvsUnavailableError("script did not return a clip")
        # normalize to 4:2:0 8-bit planar like the reference reader
        clip = self._lib.avs_take_clip(res, self._env)
        vi = self._lib.avs_get_video_info(clip).contents
        if vi.pixel_type not in (_AVS_CS_YV12, _AVS_CS_I420):
            conv = self._lib.avs_invoke(self._env, b"ConvertToYV12",
                                        res, None)
            self._lib.avs_release_value(res)
            if conv.is_error or not conv.is_clip:
                msg = conv.error_string() if conv.is_error else "no clip"
                self._lib.avs_release_value(conv)
                raise AvsUnavailableError(
                    f"ConvertToYV12 failed: {msg}")
            self._lib.avs_release_clip(clip)
            clip = self._lib.avs_take_clip(conv, self._env)
            vi = self._lib.avs_get_video_info(clip).contents
            res = conv
        self._res = res
        self._clip = clip
        self._vi = AvsInfo(width=vi.width, height=vi.height,
                           fps_num=int(vi.fps_numerator),
                           fps_den=max(int(vi.fps_denominator), 1),
                           num_frames=vi.num_frames)
        self._idx = 0

    def info(self) -> AvsInfo:
        return self._vi

    def _plane(self, frame, plane: int, w: int, h: int) -> np.ndarray:
        pitch = self._lib.avs_get_pitch_p(frame, plane)
        ptr = self._lib.avs_get_read_ptr_p(frame, plane)
        buf = np.ctypeslib.as_array(ptr, shape=(h, pitch))
        return np.array(buf[:, :w], dtype=np.uint8)

    def read(self, idx: int):
        """One decoded frame as (y, cb, cr) numpy planes."""
        vi = self._vi
        frame = self._lib.avs_get_frame(self._clip, idx)
        if not frame:
            raise AvsUnavailableError(f"avs_get_frame({idx}) failed")
        try:
            y = self._plane(frame, _AVS_PLANAR_Y, vi.width, vi.height)
            cb = self._plane(frame, _AVS_PLANAR_U, vi.width // 2,
                             vi.height // 2)
            cr = self._plane(frame, _AVS_PLANAR_V, vi.width // 2,
                             vi.height // 2)
        finally:
            self._lib.avs_release_video_frame(frame)
        return y, cb, cr

    def __iter__(self):
        return self

    def __next__(self):
        if self._idx >= self._vi.num_frames:
            raise StopIteration
        out = self.read(self._idx)
        self._idx += 1
        return out

    def close(self) -> None:
        if getattr(self, "_clip", None):
            self._lib.avs_release_clip(self._clip)
            self._clip = None
        if getattr(self, "_res", None) is not None:
            self._lib.avs_release_value(self._res)
            self._res = None
        if getattr(self, "_env", None):
            self._lib.avs_delete_script_environment(self._env)
            self._env = None
