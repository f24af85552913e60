"""Public API facade mirroring the reference C API surface
(`source/x265.h` + `encoder/api.cpp`): x265_param_*, x265_picture_*,
x265_encoder_* and multilib-style `api_get(bit_depth)` dispatch —
expressed Pythonically but name-for-name so reference users can map
their integration directly.

The reference's versioned-ABI multilib trick (`x265_api_get`
dlopen-by-bit-depth, api.cpp:1107-1180) becomes a registry keyed by
bit depth; 8-bit is wired today, 10-bit raises until Main10 lands.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .models.encoder import EncodeOutput, Encoder
from .utils.params import (Param, check_params, param_default_preset,
                           param_parse)

BUILD = 1                      # X265_BUILD analog (ABI version)


# ---- param calls ------------------------------------------------------------

def param_default() -> Param:
    return Param()


def param_default_preset_api(preset: str, tune: str = "") -> Param:
    return param_default_preset(preset, tune)


def param_parse_api(p: Param, name: str, value=None) -> None:
    param_parse(p, name, None if value is None else str(value))


def param_apply_profile(p: Param, profile: str) -> None:
    """x265_param_apply_profile analog."""
    profile = profile.lower()
    if profile in ("main", "main-intra"):
        p.internal_bit_depth = 8
    elif profile in ("main10", "main10-intra"):
        p.internal_bit_depth = 10
    elif profile == "mainstillpicture":
        p.internal_bit_depth = 8
        p.keyint = 1
        p.total_frames = 1
    else:
        raise ValueError(f"unsupported profile '{profile}'")


def check_params_api(p: Param) -> None:
    check_params(p)


# ---- picture ---------------------------------------------------------------

@dataclass
class Picture:
    """x265_picture analog: planar 4:2:0 input + per-picture results."""
    y: np.ndarray | None = None
    cb: np.ndarray | None = None
    cr: np.ndarray | None = None
    pts: int = 0
    poc: int = -1
    slice_type: str = ""
    force_qp: int = -1           # qpfile-style override (roadmap)
    user_data: object = None


def picture_init(p: Param) -> Picture:
    return Picture()


# ---- encoder calls ----------------------------------------------------------

class EncoderHandle:
    """x265_encoder_* call surface around models.Encoder."""

    def __init__(self, param: Param):
        self._enc = Encoder(param)
        self.param = param

    def headers(self) -> bytes:
        """x265_encoder_headers."""
        return self._enc.headers()

    def encode(self, pic_in: Picture | None
               ) -> list[tuple[bytes, Picture]]:
        """x265_encoder_encode: push one picture (or None to flush).
        Returns (nals, pic_out) pairs in decode order — possibly empty
        while the GOP pipeline fills (same delayed-output contract)."""
        if pic_in is None:
            outs = self._enc.flush()
        else:
            outs = self._enc.encode_push(pic_in.y, pic_in.cb, pic_in.cr)
        result = []
        for o in outs:
            po = Picture(poc=o.stats.poc, slice_type=o.stats.slice_type)
            result.append((o.nals, po))
        return result

    def reconfig(self, **kwargs) -> None:
        """x265_encoder_reconfig: safe-subset runtime changes."""
        safe = {"crf", "qp", "bitrate"}
        for k, v in kwargs.items():
            if k not in safe:
                raise ValueError(f"'{k}' is not runtime-reconfigurable")
            setattr(self.param, k, v)
            if k == "crf":
                self._enc.rc.base_qp = float(v)
            elif k == "qp" and self._enc.rc.mode == "cqp":
                self._enc.rc.base_qp = float(v)

    def stats(self) -> dict:
        """x265_encoder_get_stats analog."""
        return {**self._enc.summary(), **self._enc.rc.summary()}

    def close(self) -> None:
        self._enc.close()


def encoder_open(p: Param) -> EncoderHandle:
    return EncoderHandle(p)


# ---- multilib dispatch (x265_api_get analog) --------------------------------

@dataclass
class Api:
    bit_depth: int
    build: int
    param_default: object
    param_parse: object
    param_apply_profile: object
    encoder_open: object


def api_get(bit_depth: int = 8) -> Api:
    """x265_api_get(bitDepth): returns the API table for the requested
    internal bit depth (reference api.cpp:1107 dlopens libx265_main10;
    here depths share one implementation registry)."""
    if bit_depth in (0, 8, 10):
        # one implementation registry serves both depths (round 5:
        # Main10 all-intra wired; param validation gates the rest)
        return Api(bit_depth=8 if bit_depth == 0 else bit_depth,
                   build=BUILD,
                   param_default=param_default,
                   param_parse=param_parse_api,
                   param_apply_profile=param_apply_profile,
                   encoder_open=encoder_open)
    raise NotImplementedError(f"bit depth {bit_depth} not built")
