"""All-intra frame encoder: wavefront-batched CTU processing on device.

TPU-first replacement for the reference's WPP worker-thread row loop
(`encoder/frameencoder.cpp:1399-1970` + `common/wavefront.cpp`): instead
of threads racing over CTU rows, CTUs on each anti-diagonal d = cx+2*cy
are processed as ONE batch (the x+2y skew gives every CTU its left,
top, top-left and top-right neighbors from earlier diagonals — the same
dependency shape WPP enforces with its 2-CTU lead,
`doc/reST/threading.rst:50-92`).

Per diagonal, on device: gather reference samples -> predict all 35
modes -> transform/quant/dequant/inverse for every mode -> SSD + bit
estimate -> pick mode -> reconstruct + scatter.  The host then CABAC-
codes the chosen modes/levels in raster order.

v1 scope: CTU=CU=16, TU16 luma / TU8 chroma (DM), CQP.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.intra import predict_all_modes_batch, substitute_refs
from ..ops.quant import chroma_qp, dequant, quant
from ..ops.transforms import fwd_transform, inv_transform

PAD = 16


def _diag_schedule(wc: int, hc: int):
    """Wavefront schedule: list of (cx, cy) arrays per diagonal."""
    diags = []
    for d in range(wc - 1 + 2 * (hc - 1) + 1):
        lo = max(0, -(-(d - wc + 1) // 2))
        hi = min(hc - 1, d // 2)
        cells = [(d - 2 * cy, cy) for cy in range(lo, hi + 1)]
        if cells:
            diags.append(cells)
    return diags


@dataclass
class FrameResult:
    modes: np.ndarray          # [Hc, Wc]
    levels_y: np.ndarray       # [Hc, Wc, 16, 16]
    levels_cb: np.ndarray      # [Hc, Wc, 8, 8]
    levels_cr: np.ndarray
    recon_y: np.ndarray        # padded-to-CTU planes (uint8)
    recon_cb: np.ndarray
    recon_cr: np.ndarray


class IntraFrameEncoder:
    """Per-resolution compiled wavefront encoder (one jit per size)."""

    def __init__(self, width: int, height: int, bit_depth: int = 8,
                 lambda_scale: float = 0.57, deblock: bool = False):
        assert width % 16 == 0 and height % 16 == 0, \
            "caller pads to CTU multiple"
        self.width, self.height = width, height
        self.deblock = deblock
        self.wc, self.hc = width // 16, height // 16
        self.lambda_scale = lambda_scale
        diags = _diag_schedule(self.wc, self.hc)
        self.n_diags = len(diags)
        self.bmax = max(len(d) for d in diags)
        coords = np.zeros((self.n_diags, self.bmax, 2), dtype=np.int32)
        valid = np.zeros((self.n_diags, self.bmax), dtype=bool)
        for i, cells in enumerate(diags):
            for j, (cx, cy) in enumerate(cells):
                coords[i, j] = (cx, cy)
                valid[i, j] = True
        self._coords = jnp.asarray(coords)
        self._valid = jnp.asarray(valid)
        self._step = jax.jit(self._encode_frame)

    # ---- device code ------------------------------------------------------

    def _encode_frame(self, y, cb, cr, qp, qp_cb, qp_cr, lam):
        """y: [H, W] int32, cb/cr: [H/2, W/2] int32. Returns per-CTU
        decisions + recon planes."""
        wc, hc, bmax = self.wc, self.hc, self.bmax
        yp = jnp.full((self.height + 2 * PAD, self.width + 2 * PAD), 128,
                      jnp.int32)
        cbp = jnp.full((self.height // 2 + 2 * PAD,
                        self.width // 2 + 2 * PAD), 128, jnp.int32)
        crp = cbp
        # originals as per-CTU blocks for cheap batched gather
        oy = y.reshape(hc, 16, wc, 16).transpose(0, 2, 1, 3) \
            .reshape(hc * wc, 16, 16)
        ocb = cb.reshape(hc, 8, wc, 8).transpose(0, 2, 1, 3) \
            .reshape(hc * wc, 8, 8)
        ocr = cr.reshape(hc, 8, wc, 8).transpose(0, 2, 1, 3) \
            .reshape(hc * wc, 8, 8)

        mode_map = jnp.ones((hc + 1, wc), jnp.int32)
        out_modes = jnp.zeros((self.n_diags, bmax), jnp.int32)
        out_ly = jnp.zeros((self.n_diags, bmax, 16, 16), jnp.int32)
        out_lcb = jnp.zeros((self.n_diags, bmax, 8, 8), jnp.int32)
        out_lcr = jnp.zeros((self.n_diags, bmax, 8, 8), jnp.int32)

        def gather_refs(plane, x0, y0, n):
            ar = jnp.arange(2 * n)
            top = plane[(y0 - 1)[:, None], x0[:, None] + ar[None, :]]
            left = plane[y0[:, None] + ar[None, :], (x0 - 1)[:, None]]
            corner = plane[y0 - 1, x0 - 1]
            return top, left, corner

        def scatter_block(plane, x0, y0, blocks, n, valid):
            # invalid lanes are redirected into the [0,16) pad corner
            xs = jnp.where(valid, x0, 0)
            ys = jnp.where(valid, y0, 0)
            assert xs.ndim == 1 and ys.ndim == 1
            ar = jnp.arange(n)
            yi = ys[:, None, None] + ar[None, :, None]
            xi = xs[:, None, None] + ar[None, None, :]
            return plane.at[yi, xi].set(blocks)

        def analyse_plane(plane, orig_blocks, ctu_idx, cx, cy, n, c_idx,
                          qpv):
            x0 = PAD + cx * n
            y0 = PAD + cy * n
            traw, lraw, craw = gather_refs(plane, x0, y0, n)
            top, left, corner = substitute_refs(traw, lraw, craw, cx, cy,
                                                n, wc)
            preds = predict_all_modes_batch(top, left, corner, n, c_idx)
            orig = jnp.take(orig_blocks, ctu_idx, axis=0)
            resi = orig[:, None] - preds
            coeff = fwd_transform(resi)
            levels = quant(coeff, qpv)
            rec_resi = inv_transform(dequant(levels, qpv))
            recon = jnp.clip(preds + rec_resi, 0, 255)
            ssd = jnp.sum((recon - orig[:, None]) ** 2, axis=(2, 3))
            return preds, levels, recon, ssd, orig, (x0, y0)

        def body(d, state):
            (yp, cbp, crp, mode_map, out_modes, out_ly, out_lcb,
             out_lcr) = state
            cx = self._coords[d, :, 0]
            cy = self._coords[d, :, 1]
            val = self._valid[d]
            ctu_idx = cy * wc + cx

            preds, levels, recon, ssd, orig, (x0, y0) = analyse_plane(
                yp, oy, ctu_idx, cx, cy, 16, 0, qp)

            # ---- mode decision: SSD + lambda * estimated bits ----
            # residual bits proxy: ~2*log2(|l|)+2 per nonzero coeff
            absl = jnp.abs(levels).astype(jnp.float32)
            rbits = jnp.sum(jnp.where(absl > 0,
                                      2.0 * jnp.log2(absl + 1.0) + 1.5,
                                      0.02), axis=(2, 3))
            # mode signalling bits with MPM (above is always DC at the
            # 16px-CTU boundary, cf. spec 8.4.2 above-CTU rule)
            left_mode = jnp.where(cx > 0, mode_map[cy, cx - 1], 1)
            is_small = left_mode < 2
            mpm0 = jnp.where(is_small, 0, left_mode)
            mpm1 = jnp.where(is_small, 1, 1)
            mpm2 = jnp.where(is_small, 26, 0)
            modes35 = jnp.arange(35)[None, :]
            mbits = jnp.where(
                modes35 == mpm0[:, None], 2.0,
                jnp.where((modes35 == mpm1[:, None])
                          | (modes35 == mpm2[:, None]), 3.0, 6.0))
            cost = ssd.astype(jnp.float32) + lam * (rbits + mbits)
            best = jnp.argmin(cost, axis=1)

            bi = best[:, None, None, None]
            lv_y = jnp.take_along_axis(levels, bi, axis=1)[:, 0]
            rec_y = jnp.take_along_axis(recon, bi, axis=1)[:, 0]
            yp = scatter_block(yp, x0, y0, rec_y, 16, val)

            # ---- chroma (DM mode) ----
            def chroma(plane, ob, qpc):
                pr, lv, rc, _, og, (cx0, cy0) = analyse_plane(
                    plane, ob, ctu_idx, cx, cy, 8, 1, qpc)
                lvb = jnp.take_along_axis(lv, bi, axis=1)[:, 0]
                rcb = jnp.take_along_axis(rc, bi, axis=1)[:, 0]
                plane = scatter_block(plane, cx0, cy0, rcb, 8, val)
                return plane, lvb
            cbp, lv_cb = chroma(cbp, ocb, qp_cb)
            crp, lv_cr = chroma(crp, ocr, qp_cr)

            safe_cy = jnp.where(val, cy, hc)
            mode_map = mode_map.at[safe_cy, cx].set(best.astype(jnp.int32))
            out_modes = out_modes.at[d].set(best.astype(jnp.int32))
            out_ly = out_ly.at[d].set(lv_y)
            out_lcb = out_lcb.at[d].set(lv_cb)
            out_lcr = out_lcr.at[d].set(lv_cr)
            return (yp, cbp, crp, mode_map, out_modes, out_ly, out_lcb,
                    out_lcr)

        state = (yp, cbp, crp, mode_map, out_modes, out_ly, out_lcb,
                 out_lcr)
        state = jax.lax.fori_loop(0, self.n_diags, body, state)
        (yp, cbp, crp, mode_map, out_modes, out_ly, out_lcb,
         out_lcr) = state
        rec_y = yp[PAD:-PAD, PAD:-PAD]
        rec_cb = cbp[PAD:-PAD, PAD:-PAD]
        rec_cr = crp[PAD:-PAD, PAD:-PAD]
        if self.deblock:
            # in-loop filter on the full frame (intra prediction above
            # used the unfiltered plane, per spec)
            from ..ops.deblock import deblock_chroma, deblock_luma
            rec_y = deblock_luma(rec_y, qp)
            rec_cb = deblock_chroma(rec_cb, qp_cb)
            rec_cr = deblock_chroma(rec_cr, qp_cr)
        return (out_modes, out_ly, out_lcb, out_lcr, rec_y, rec_cb,
                rec_cr)

    # ---- host wrapper -----------------------------------------------------

    def encode(self, y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
               qp: int) -> FrameResult:
        lam = self.lambda_scale * 2.0 ** ((qp - 12) / 3.0)
        qcb = chroma_qp(qp)
        (out_modes, out_ly, out_lcb, out_lcr, ry, rcb, rcr) = \
            [np.asarray(a) for a in self._step(
                jnp.asarray(y, jnp.int32), jnp.asarray(cb, jnp.int32),
                jnp.asarray(cr, jnp.int32), jnp.int32(qp),
                jnp.int32(qcb), jnp.int32(qcb), jnp.float32(lam))]
        # de-diagonalize to raster order (vectorized scatter)
        modes = np.zeros((self.hc, self.wc), np.int32)
        ly = np.zeros((self.hc, self.wc, 16, 16), np.int32)
        lcb = np.zeros((self.hc, self.wc, 8, 8), np.int32)
        lcr = np.zeros((self.hc, self.wc, 8, 8), np.int32)
        valid = np.asarray(self._valid)
        coords = np.asarray(self._coords)
        vcx = coords[..., 0][valid]
        vcy = coords[..., 1][valid]
        modes[vcy, vcx] = out_modes[valid]
        ly[vcy, vcx] = out_ly[valid]
        lcb[vcy, vcx] = out_lcb[valid]
        lcr[vcy, vcx] = out_lcr[valid]
        return FrameResult(modes, ly, lcb, lcr,
                           ry.astype(np.uint8), rcb.astype(np.uint8),
                           rcr.astype(np.uint8))
