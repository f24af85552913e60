"""Rate control: CQP / CRF / ABR / VBV / 2-pass
(role of `encoder/ratecontrol.cpp`).

Semantics follow the reference's conventions:

  - qscale <-> QP: qscale = 0.85 * 2^((qp-12)/6)  (x265 qp2qscale)
  - I frames run at qscale/ipFactor relative to P; B frames at
    qscale*pbFactor (half-offset for referenced Bref pyramid levels)
  - ABR: multiplicative feedback on cumulative wanted vs actual bits
    (the core of `rateEstimateQscale`'s ABR path), per-frame QP step
    clamping
  - VBV (`clipQscale:2535` / `updateVbv:2978`): leaky-bucket buffer
    tracked per frame; the frame QP is clipped so the predicted frame
    size keeps the buffer above the underflow line; the bits-per-
    qscale predictor is the reference's damped moving average
  - 2-pass (`writeRateControlFrameStats:3204` / `initPass2:1105`):
    pass 1 logs per-frame (type, qp, bits, complexity); pass 2
    allocates qscale ~ complexity^(1-qcomp) (x265 qcomp=0.6 default)
    scaled by a rate factor solved to hit the target, then runs ABR
    feedback around the plan

The row-level VBV re-encode trigger of the reference
(`rowVbvRateControl:2779`) is intentionally frame-level here: the TPU
pipeline encodes whole frames as batched device steps, so mid-frame
QP surgery would force a host round-trip per row; the frame-level
clip plus the lookahead's per-CTU offsets covers the same contract
(bounded buffer excursion) in a TPU-shaped way.

Deterministic (host-side scalar chain), matching the reference's
documented determinism contract for non-VBV modes
(`doc/reST/threading.rst:176-191`); our VBV is deterministic too since
there are no encode races.
"""

from __future__ import annotations

import math
import os

from ..utils.params import Param


def qp_to_qscale(qp: float) -> float:
    return 0.85 * 2.0 ** ((qp - 12.0) / 6.0)


def qscale_to_qp(qs: float) -> float:
    return 12.0 + 6.0 * math.log2(max(qs, 1e-6) / 0.85)


class Predictor:
    """Reference RC predictor (`ratecontrol.cpp` Predictor): damped
    least squares of bits ~ coeff * complexity / qscale."""

    def __init__(self) -> None:
        self.coeff = 0.25
        self.count = 1.0
        self.decay = 0.5
        self.offset = 0.0

    def predict(self, qscale: float, complexity: float) -> float:
        return (self.coeff * complexity + self.offset) / qscale

    def update(self, qscale: float, complexity: float,
               bits: float) -> None:
        if complexity < 1e-3:
            return
        new_coeff = bits * qscale / complexity
        self.count *= self.decay
        self.coeff *= self.count
        self.count += 1.0
        self.coeff = (self.coeff + new_coeff) / self.count


class RateControl:
    def __init__(self, param: Param):
        self.param = param
        self.mode = param.rc_mode
        if param.bitrate > 0 and self.mode not in ("abr",):
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
            self.base_qp = min(51.0, max(10.0,
                                         21.0 - 5.0 * math.log2(bpp)))
        else:
            self.target_per_frame = 0.0
            self.base_qp = float(param.crf if self.mode == "crf"
                                 else param.qp)
        self.last_qp = self.base_qp
        # ---- VBV state (reference initVBV / updateVbv) ----
        self.vbv = param.vbv_maxrate > 0 and param.vbv_bufsize > 0
        if self.vbv:
            self.buffer_size = param.vbv_bufsize * 1000.0
            self.buffer_rate = param.vbv_maxrate * 1000.0 / self.fps
            self.buffer_fill = self.buffer_size * param.vbv_init
            self.pred = {t: Predictor() for t in "IPBb"}
        # ---- 2-pass state ----
        self.pass_num = getattr(param, "pass_num", 0)
        self.stats_path = getattr(param, "stats_file", "") or \
            "x265amod_tpu_2pass.log"
        self._pass1_log: list[dict] = []
        self._plan: list[dict] = []
        self._plan_idx = 0
        self.qcomp = 0.6
        if self.pass_num == 2:
            self._init_pass2()

    # ------------------------------------------------------------------
    def _complexity(self, bits: float, qp: float) -> float:
        return bits * qp_to_qscale(qp)

    def _init_pass2(self) -> None:
        if not os.path.exists(self.stats_path):
            raise FileNotFoundError(
                f"2-pass stats file missing: {self.stats_path}")
        entries = []
        with open(self.stats_path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                kv = dict(tok.split(":", 1) for tok in line.split())
                entries.append(dict(
                    type=kv["type"], qp=float(kv["q"]),
                    bits=int(kv["bits"])))
        assert entries, "empty 2-pass stats file"
        target_total = self.param.bitrate * 1000.0 / self.fps \
            * len(entries)
        # complexity per frame, blurred over a small window (cplxblur)
        cplx = [self._complexity(e["bits"], e["qp"]) for e in entries]
        blurred = []
        for i in range(len(cplx)):
            lo, hi = max(0, i - 2), min(len(cplx), i + 3)
            blurred.append(sum(cplx[lo:hi]) / (hi - lo))
        # solve rate factor: bits_i = cplx_i / qscale_i with
        # qscale_i = cplx_i^(1-qcomp) / rf  ->  bits_i = rf*cplx_i^qcomp
        def total(rf: float) -> float:
            return sum(rf * c ** self.qcomp for c in blurred)
        lo, hi = 1e-6, 1e6
        for _ in range(60):
            mid = math.sqrt(lo * hi)
            if total(mid) > target_total:
                hi = mid
            else:
                lo = mid
        rf = math.sqrt(lo * hi)
        for e, c in zip(entries, blurred):
            qs = c ** (1.0 - self.qcomp) / max(rf, 1e-9)
            qp = qscale_to_qp(qs)
            # per-type offsets are applied at frame_qp time; store the
            # P-equivalent base
            if e["type"] == "I":
                qp += self.ip_offset
            elif e["type"] == "B":
                qp -= 0.5 * self.pb_offset
            elif e["type"] == "b":
                qp -= self.pb_offset
            self._plan.append(dict(qp=qp, type=e["type"]))
        self.target_per_frame = self.param.bitrate * 1000.0 / self.fps

    # ------------------------------------------------------------------
    def frame_qp(self, slice_type: str) -> int:
        if self.pass_num == 2 and self._plan_idx < len(self._plan):
            qp = self._plan[self._plan_idx]["qp"]
            # ABR feedback around the plan keeps the target on drift
            if self.wanted_bits > 0:
                overshoot = self.actual_bits / self.wanted_bits
                qp += 3.0 * math.log2(max(min(overshoot, 4.0), 0.25))
        else:
            qp = self.base_qp
            if self.mode == "abr" and self.wanted_bits > 0:
                overshoot = self.actual_bits / self.wanted_bits
                qp = self.base_qp + 6.0 * math.log2(max(overshoot, 1e-3))
                qp = min(max(qp, self.last_qp - self.param.qp_step),
                         self.last_qp + self.param.qp_step)
        if slice_type == "I":
            qp -= self.ip_offset
        elif slice_type == "B":      # referenced B (pyramid mid-level)
            qp += 0.5 * self.pb_offset
        elif slice_type == "b":      # non-referenced B (pyramid leaf)
            qp += self.pb_offset
        if self.vbv:
            qp = self._clip_qp_vbv(qp, slice_type)
        return int(round(min(max(qp, 0.0), 51.0)))

    def _clip_qp_vbv(self, qp: float, slice_type: str) -> float:
        """Frame-level clipQscale: raise QP until the predicted frame
        size keeps the buffer above 50% of one frame's budget; lower
        bound against overflow (buffer full -> allow lower QP)."""
        pred = self.pred[slice_type if slice_type in "IPb" else "B"]
        cplx = max(self.actual_bits / max(self.frames, 1), 5000.0)
        for _ in range(16):
            bits = pred.predict(qp_to_qscale(qp), cplx)
            if self.buffer_fill + self.buffer_rate - bits >= \
                    0.5 * self.buffer_rate or qp >= 51.0:
                break
            qp += 1.0
        # overflow guard: if buffer would overflow, drop QP to spend
        for _ in range(16):
            bits = pred.predict(qp_to_qscale(qp), cplx)
            if self.buffer_fill + self.buffer_rate - bits \
                    <= self.buffer_size or qp <= 1.0:
                break
            qp -= 1.0
        return qp

    # ------------------------------------------------------------------
    def update(self, bits: int, slice_type: str, qp: int) -> None:
        self.frames += 1
        self.actual_bits += bits
        if self.pass_num == 2:
            self._plan_idx += 1
        if self.mode == "abr" or self.pass_num == 2:
            self.wanted_bits += self.target_per_frame
            if slice_type == "P":
                self.last_qp = qp
        if self.vbv:
            t = slice_type if slice_type in "IPb" else "B"
            cplx = max(self.actual_bits / max(self.frames, 1), 5000.0)
            self.pred[t].update(qp_to_qscale(qp), cplx, bits)
            self.buffer_fill += self.buffer_rate - bits
            self.buffer_fill = min(max(self.buffer_fill, 0.0),
                                   self.buffer_size)
        if self.pass_num == 1:
            self._pass1_log.append(dict(
                type=slice_type, qp=qp, bits=bits))

    def write_stats(self) -> None:
        """Pass-1 stats file (reference writeRateControlFrameStats)."""
        if self.pass_num != 1:
            return
        with open(self.stats_path, "w") as f:
            for i, e in enumerate(self._pass1_log):
                f.write(f"in:{i} out:{i} type:{e['type']} "
                        f"q:{e['qp']:.2f} bits:{e['bits']}\n")

    def summary(self) -> dict:
        out = {
            "mode": self.mode if self.pass_num == 0
            else f"2pass-p{self.pass_num}",
            "actual_kbps": self.actual_bits * self.fps
            / max(self.frames, 1) / 1000.0,
        }
        if self.vbv:
            out["vbv_fill"] = self.buffer_fill / self.buffer_size
        return out
