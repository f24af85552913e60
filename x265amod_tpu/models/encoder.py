"""Top-level encoder: the role of reference `encoder/encoder.cpp`
(Encoder::create/encode) + `encoder/api.cpp` (x265_encoder_open/encode),
exposed as a Python class.

Pipelines: all-intra CQP (BASELINE.md config 1) and low-delay P CQP
(config 2).  GOP structure: IDR every `keyint` frames, P otherwise;
the decoded picture buffer is a single device-resident reference
(role of `encoder/dpb.cpp` for the 1-ref low-delay case).  Device does
the wavefront analysis; host does CABAC + NAL.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np

from ..bitstream.headers import (PpsInfo, SpsInfo, determine_level,
                                 write_pps, write_slice_header, write_sps,
                                 write_vps)
from ..bitstream.nal import (NAL_IDR_W_RADL, NAL_TRAIL_R, wrap_nal,
                             NAL_PPS, NAL_SPS, NAL_VPS)
from ..cabac.engine import CabacEncoder
from ..cabac.syntax import encode_inter_ctu16, encode_intra_ctu16
from ..utils.params import Param, check_params
from .intra_frame import IntraFrameEncoder
from .inter_frame import MAX_MERGE, InterFrameEncoder
from .ratecontrol import RateControl


@dataclass
class FrameStats:
    poc: int
    slice_type: str
    qp: int
    bits: int
    psnr_y: float
    psnr_cb: float
    psnr_cr: float
    enc_time: float


@dataclass
class EncodeOutput:
    nals: bytes
    stats: FrameStats
    recon: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None


def _pad_to_ctu(plane: np.ndarray, ctu: int) -> np.ndarray:
    h, w = plane.shape
    ph = -(-h // ctu) * ctu
    pw = -(-w // ctu) * ctu
    if (ph, pw) == (h, w):
        return plane
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


class Encoder:
    """x265_encoder_open/encode/close analog."""

    def __init__(self, param: Param):
        check_params(param)
        self.param = param
        w, h = param.width, param.height
        ctu = 16  # v1 pipeline CTU size
        self.pad_w = -(-w // ctu) * ctu
        self.pad_h = -(-h // ctu) * ctu
        fps = param.fps_num / max(param.fps_den, 1)
        self.inter_enabled = param.keyint != 1
        if self.inter_enabled and param.deblock:
            # boundary-strength derivation for inter frames lands with
            # the deblock generalization; keep streams conformant
            param.deblock = False
        self.sps = SpsInfo(
            width=self.pad_w, height=self.pad_h,
            conf_win_right=(self.pad_w - w) // 2,
            conf_win_bottom=(self.pad_h - h) // 2,
            fps_num=param.fps_num, fps_den=param.fps_den,
            level_idc=determine_level(self.pad_w, self.pad_h, fps),
            num_negative_ref=1 if self.inter_enabled else 0)
        self.pps = PpsInfo(init_qp=26,
                           deblocking_disabled=not param.deblock,
                           beta_offset_div2=param.deblock_beta_offset,
                           tc_offset_div2=param.deblock_tc_offset)
        self.frame_encoder = IntraFrameEncoder(self.pad_w, self.pad_h,
                                               deblock=param.deblock)
        self.inter_encoder = InterFrameEncoder(self.pad_w, self.pad_h) \
            if self.inter_enabled else None
        self.poc = 0
        self.total_bits = 0
        self.frame_stats: list[FrameStats] = []
        self._ref_dev = None       # device recon planes of last frame
        self.rc = RateControl(param)

    def headers(self) -> bytes:
        return (wrap_nal(NAL_VPS, write_vps(self.sps))
                + wrap_nal(NAL_SPS, write_sps(self.sps))
                + wrap_nal(NAL_PPS, write_pps(self.pps)))

    # -- frame pipeline ------------------------------------------------

    def _dispatch(self, y, cb, cr, return_recon):
        t0 = time.time()
        yp = _pad_to_ctu(np.asarray(y), 16)
        cbp = _pad_to_ctu(np.asarray(cb), 8)
        crp = _pad_to_ctu(np.asarray(cr), 8)
        is_idr = (self.poc % max(self.param.keyint, 1) == 0) or \
            self._ref_dev is None or not self.inter_enabled
        qp = self.rc.frame_qp("I" if is_idr else "P")
        poc = self.poc
        self.poc += 1
        if is_idr:
            # intra path needs recon downloaded only if requested; the
            # device recon is needed as reference either way
            dev_out = self.frame_encoder.encode_async(
                yp, cbp, crp, qp, want_recon=True)
            if self.inter_enabled:
                self._ref_dev = dev_out[5:8]
            return ("I", dev_out, t0, return_recon, poc, qp)
        dev_out = self.inter_encoder.encode_async(
            yp, cbp, crp, self._ref_dev, qp, want_recon=return_recon)
        self._ref_dev = dev_out[9:12]
        return ("P", dev_out, t0, return_recon, poc, qp)

    def encode_pipelined(self, frames, return_recon: bool = False):
        """Generator with a 2-deep frame pipeline (TPU analog of the
        reference's frame threading, `doc/reST/threading.rst:123-215`).
        For P GOPs the pipeline is still correct: dispatch N+1 only uses
        device-resident recon handles (data dependencies resolved by
        XLA's async queue, not host sync)."""
        pending = None
        for fr in frames:
            cur = self._dispatch(*fr, return_recon)
            if pending is not None:
                yield self._finish(pending)
            pending = cur
        if pending is not None:
            yield self._finish(pending)

    def encode_frame(self, y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                     return_recon: bool = False) -> EncodeOutput:
        return self._finish(self._dispatch(y, cb, cr, return_recon))

    # -- host side -------------------------------------------------------

    def _finish(self, pending) -> EncodeOutput:
        slice_type, dev_out, t0, return_recon, poc, qp = pending
        w, h = self.param.width, self.param.height
        if slice_type == "I":
            res = self.frame_encoder.collect(dev_out,
                                             want_recon=return_recon)
            payload = self._cabac_intra(res, qp)
            nal_type = NAL_IDR_W_RADL
        else:
            res = self.inter_encoder.collect(dev_out,
                                             want_recon=return_recon)
            payload = self._cabac_inter(res, qp)
            nal_type = NAL_TRAIL_R

        bw = write_slice_header(self.sps, self.pps, slice_type, qp,
                                nal_type, poc=poc)
        bw.append_bytes(payload)
        nal = wrap_nal(nal_type, bw.data())
        if self.param.repeat_headers or poc == 0:
            nal = self.headers() + nal

        def sse_psnr(sse, npix):
            mse = sse / max(npix, 1)
            return 99.99 if mse <= 0 else float(
                10.0 * np.log10(255.0 * 255.0 / mse))
        npix_y = self.pad_w * self.pad_h
        stats = FrameStats(
            poc=poc, slice_type=slice_type, qp=qp, bits=len(nal) * 8,
            psnr_y=sse_psnr(float(res.sse[0]), npix_y),
            psnr_cb=sse_psnr(float(res.sse[1]), npix_y // 4),
            psnr_cr=sse_psnr(float(res.sse[2]), npix_y // 4),
            enc_time=time.time() - t0)
        self.frame_stats.append(stats)
        self.total_bits += stats.bits
        self.rc.update(stats.bits, slice_type, qp)
        recon = None
        if return_recon and res.recon_y is not None:
            recon = (res.recon_y[:h, :w], res.recon_cb[:h // 2, :w // 2],
                     res.recon_cr[:h // 2, :w // 2])
        return EncodeOutput(nal, stats, recon)

    def _cabac_intra(self, res, qp) -> bytes:
        from ..native import encode_islice_ctu16
        payload = encode_islice_ctu16(res.modes, res.levels_y,
                                      res.levels_cb, res.levels_cr, qp)
        if payload is not None:
            return payload
        enc = CabacEncoder()
        enc.init_contexts("I", qp)
        hc, wc = res.modes.shape
        for cy in range(hc):
            for cx in range(wc):
                left_mode = int(res.modes[cy, cx - 1]) if cx > 0 else 1
                encode_intra_ctu16(
                    enc, int(res.modes[cy, cx]), res.levels_y[cy, cx],
                    res.levels_cb[cy, cx], res.levels_cr[cy, cx],
                    left_mode, 1)
                enc.encode_terminate(
                    1 if (cy == hc - 1 and cx == wc - 1) else 0)
        return enc.finish()

    def _cabac_inter(self, res, qp) -> bytes:
        from ..native import encode_pslice_ctu16
        payload = encode_pslice_ctu16(res, qp)
        if payload is not None:
            return payload
        enc = CabacEncoder()
        enc.init_contexts("P", qp)
        hc, wc = res.kinds.shape
        for cy in range(hc):
            for cx in range(wc):
                kind = int(res.kinds[cy, cx])
                ctu = {
                    "kind": ("skip", "inter", "intra")[kind],
                    "merge_idx": int(res.merge_idx[cy, cx]),
                    "mvd": (int(res.mvd[cy, cx, 0]),
                            int(res.mvd[cy, cx, 1])),
                    "mvp_idx": int(res.mvp_idx[cy, cx]),
                    "luma_mode": int(res.modes[cy, cx]),
                    "levels_y": res.levels_y[cy, cx],
                    "levels_cb": res.levels_cb[cy, cx],
                    "levels_cr": res.levels_cr[cy, cx],
                }
                left_skip = int(res.kinds[cy, cx - 1] == 0) if cx > 0 \
                    else 0
                above_skip = int(res.kinds[cy - 1, cx] == 0) if cy > 0 \
                    else 0
                left_intra_mode = int(res.modes[cy, cx - 1]) \
                    if (cx > 0 and res.kinds[cy, cx - 1] == 2) else 1
                encode_inter_ctu16(enc, ctu, left_skip, above_skip,
                                   left_intra_mode, MAX_MERGE)
                enc.encode_terminate(
                    1 if (cy == hc - 1 and cx == wc - 1) else 0)
        return enc.finish()

    def summary(self) -> dict:
        n = len(self.frame_stats)
        if not n:
            return {}
        fps = self.param.fps_num / max(self.param.fps_den, 1)
        return {
            "frames": n,
            "bitrate_kbps": self.total_bits * fps / n / 1000.0,
            "psnr_y": float(np.mean([s.psnr_y for s in self.frame_stats])),
            "psnr_cb": float(np.mean([s.psnr_cb for s in self.frame_stats])),
            "psnr_cr": float(np.mean([s.psnr_cr for s in self.frame_stats])),
            "enc_fps": n / max(sum(s.enc_time for s in self.frame_stats),
                               1e-9),
        }
