"""Rate control: CQP / CRF / ABR (role of `encoder/ratecontrol.cpp`).

v1 scope: frame-level QP decisions (the reference's row-level VBV loop
`rowVbvRateControl:2779` and lookahead-complexity CRF scaling need the
lookahead, phase 3).  Semantics follow the reference's conventions:

  - qscale <-> QP: qscale = 0.85 * 2^((qp-12)/6)  (x265 qp2qscale)
  - I frames run at qscale/ipFactor relative to P (param.ip_factor,
    reference `ratecontrol.cpp` ipFactor handling)
  - ABR: multiplicative feedback on cumulative wanted vs actual bits
    (the core of `rateEstimateQscale`'s ABR path without the satd
    complexity window), with per-frame QP step clamping (param.qp_step)

Deterministic (host-side scalar chain), matching the reference's
documented determinism contract for non-VBV modes
(`doc/reST/threading.rst:176-191`).
"""

from __future__ import annotations

import math

from ..utils.params import Param


def qp_to_qscale(qp: float) -> float:
    return 0.85 * 2.0 ** ((qp - 12.0) / 6.0)


def qscale_to_qp(qs: float) -> float:
    return 12.0 + 6.0 * math.log2(max(qs, 1e-6) / 0.85)


class RateControl:
    def __init__(self, param: Param):
        self.param = param
        self.mode = param.rc_mode
        if param.bitrate > 0:
            self.mode = "abr"
        elif self.mode not in ("cqp", "crf", "abr"):
            self.mode = "cqp"
        self.fps = param.fps_num / max(param.fps_den, 1)
        self.frames = 0
        self.wanted_bits = 0.0
        self.actual_bits = 0.0
        self.ip_offset = 6.0 * math.log2(max(param.ip_factor, 1.01))
        self.pb_offset = 6.0 * math.log2(max(param.pb_factor, 1.01))
        if self.mode == "abr":
            self.target_per_frame = param.bitrate * 1000.0 / self.fps
            bpp = self.target_per_frame / max(
                param.width * param.height, 1)
            # initial QP guess from bits-per-pixel (reference
            # ratecontrol.cpp init heuristics re-fit)
            self.base_qp = min(51.0, max(10.0,
                                         21.0 - 5.0 * math.log2(bpp)))
        else:
            self.base_qp = float(param.crf if self.mode == "crf"
                                 else param.qp)
        self.last_qp = self.base_qp

    def frame_qp(self, slice_type: str) -> int:
        qp = self.base_qp
        if self.mode == "abr" and self.wanted_bits > 0:
            overshoot = self.actual_bits / self.wanted_bits
            qp = self.base_qp + 6.0 * math.log2(max(overshoot, 1e-3))
            # damp + clamp step per frame
            qp = min(max(qp, self.last_qp - self.param.qp_step),
                     self.last_qp + self.param.qp_step)
        if slice_type == "I":
            qp -= self.ip_offset
        elif slice_type == "B":      # referenced B (pyramid mid-level)
            qp += 0.5 * self.pb_offset
        elif slice_type == "b":      # non-referenced B (pyramid leaf)
            qp += self.pb_offset
        qp = int(round(min(max(qp, 0.0), 51.0)))
        return qp

    def update(self, bits: int, slice_type: str, qp: int) -> None:
        self.frames += 1
        self.actual_bits += bits
        if self.mode == "abr":
            self.wanted_bits += self.target_per_frame
            if slice_type == "P":
                self.last_qp = qp

    def summary(self) -> dict:
        return {
            "mode": self.mode,
            "actual_kbps": self.actual_bits * self.fps
            / max(self.frames, 1) / 1000.0,
        }
