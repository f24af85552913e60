"""Top-level encoder: the role of reference `encoder/encoder.cpp`
(Encoder::create/encode) + `encoder/api.cpp` (x265_encoder_open/encode),
exposed as a Python class.

v1 pipeline: all-intra CQP (BASELINE.md measurement config 1).  Frames
are encoded as IDR_W_RADL with repeated headers optional; device does
the wavefront analysis (models/intra_frame.py), host does CABAC + NAL.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

from ..bitstream.headers import (PpsInfo, SpsInfo, determine_level,
                                 write_pps, write_slice_header, write_sps,
                                 write_vps)
from ..bitstream.nal import (NAL_IDR_W_RADL, NAL_PPS, NAL_SPS, NAL_VPS,
                             wrap_nal)
from ..cabac.engine import CabacEncoder
from ..cabac.syntax import encode_intra_ctu16
from ..utils.params import Param, check_params
from .intra_frame import IntraFrameEncoder


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


def _psnr(a: np.ndarray, b: np.ndarray, maxv: int = 255) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return 99.99
    return 10.0 * np.log10(maxv * maxv / mse)


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
        self.sps = SpsInfo(
            width=self.pad_w, height=self.pad_h,
            conf_win_right=(self.pad_w - w) // 2,
            conf_win_bottom=(self.pad_h - h) // 2,
            fps_num=param.fps_num, fps_den=param.fps_den,
            level_idc=determine_level(self.pad_w, self.pad_h, fps))
        self.pps = PpsInfo(init_qp=26,
                           deblocking_disabled=not param.deblock,
                           beta_offset_div2=param.deblock_beta_offset,
                           tc_offset_div2=param.deblock_tc_offset)
        self.frame_encoder = IntraFrameEncoder(self.pad_w, self.pad_h,
                                               deblock=param.deblock)
        self.poc = 0
        self.total_bits = 0
        self.frame_stats: list[FrameStats] = []

    def headers(self) -> bytes:
        return (wrap_nal(NAL_VPS, write_vps(self.sps))
                + wrap_nal(NAL_SPS, write_sps(self.sps))
                + wrap_nal(NAL_PPS, write_pps(self.pps)))

    def _dispatch(self, y, cb, cr, return_recon):
        t0 = time.time()
        qp = self.param.qp
        yp = _pad_to_ctu(np.asarray(y), 16)
        cbp = _pad_to_ctu(np.asarray(cb), 8)
        crp = _pad_to_ctu(np.asarray(cr), 8)
        dev_out = self.frame_encoder.encode_async(
            yp, cbp, crp, qp, want_recon=return_recon)
        return (dev_out, t0, return_recon)

    def encode_pipelined(self, frames, return_recon: bool = False):
        """Generator: encode an iterable of (y, cb, cr) with a 2-deep
        frame pipeline (next frame's device work overlaps this frame's
        transfers + host CABAC) — the TPU analog of the reference's
        frame threading (`doc/reST/threading.rst:123-215`)."""
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

    def _finish(self, pending) -> EncodeOutput:
        dev_out, t0, return_recon = pending
        qp = self.param.qp
        w, h = self.param.width, self.param.height
        res = self.frame_encoder.collect(dev_out, want_recon=return_recon)

        # host CABAC in raster order (WPP substreams land in phase 5):
        # native C++ finalizer, Python oracle as fallback
        from ..native import encode_islice_ctu16
        payload = encode_islice_ctu16(res.modes, res.levels_y,
                                      res.levels_cb, res.levels_cr, qp)
        if payload is None:
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
                    last = (cy == hc - 1 and cx == wc - 1)
                    enc.encode_terminate(1 if last else 0)
            payload = enc.finish()

        bw = write_slice_header(self.sps, self.pps, "I", qp,
                                NAL_IDR_W_RADL, poc=self.poc)
        bw.append_bytes(payload)
        nal = wrap_nal(NAL_IDR_W_RADL, bw.data())
        if self.param.repeat_headers or self.poc == 0:
            nal = self.headers() + nal

        # PSNR from device-computed SSE (over padded planes; padding is
        # edge-replicated so the bias is negligible for stats purposes)
        def sse_psnr(sse, npix):
            mse = sse / max(npix, 1)
            return 99.99 if mse <= 0 else float(
                10.0 * np.log10(255.0 * 255.0 / mse))
        npix_y = self.pad_w * self.pad_h
        stats = FrameStats(
            poc=self.poc, slice_type="I", qp=qp, bits=len(nal) * 8,
            psnr_y=sse_psnr(float(res.sse[0]), npix_y),
            psnr_cb=sse_psnr(float(res.sse[1]), npix_y // 4),
            psnr_cr=sse_psnr(float(res.sse[2]), npix_y // 4),
            enc_time=time.time() - t0)
        self.frame_stats.append(stats)
        self.total_bits += stats.bits
        self.poc += 1
        recon = (res.recon_y[:h, :w], res.recon_cb[:h // 2, :w // 2],
                 res.recon_cr[:h // 2, :w // 2]) if return_recon else None
        return EncodeOutput(nal, stats, recon)

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
