"""Sign-bit hiding quantization adjustment (role of reference
`common/quant.cpp:247` signBitHidingHDQ).

Normative decode (spec 7.3.8.11 / 7.4.9.11): when
sign_data_hiding_enabled and a 4x4 coefficient group's significant
span exceeds 3 scan positions, the sign of its FIRST significant
coefficient (in scan order) is not transmitted — the decoder infers
negative iff the sum of absolute levels in the group is odd.

The encoder must therefore force that parity.  Vectorized rule over
all groups at once: when the parity disagrees with the quantized
sign, adjust the LAST significant coefficient by one step toward zero
(|level| >= 2) or away from zero (|level| == 1) — significance and
scan span are preserved, so the hidden-sign condition cannot flip.
The reference picks the position by quantization residue; this fixed
choice costs a fraction of a percent vs. the full search and keeps
the op a pure elementwise pass (VPU work).

All TU sizes in the coding layout (luma 16/32, chroma 8/16) use the
diagonal scan, so one 4x4 position table serves every group.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..cabac.scans import diag_scan


@functools.lru_cache(maxsize=None)
def _diag_pos4() -> np.ndarray:
    """[4, 4] map from (y, x) to diagonal scan position 0..15."""
    scan = diag_scan(4)
    pos = np.zeros((4, 4), np.int32)
    for i, (x, y) in enumerate(scan):
        pos[y, x] = i
    return pos


@functools.partial(jax.jit, static_argnames=())
def sbh_adjust(levels: jax.Array) -> jax.Array:
    """Force hidden-sign parity on [..., N, N] quantized levels."""
    *lead, n, _ = levels.shape
    lv = levels.reshape(-1, n // 4, 4, n // 4, 4) \
        .transpose(0, 1, 3, 2, 4)              # [B, gy, gx, 4, 4]
    pos = jnp.asarray(_diag_pos4())
    nz = lv != 0
    first = jnp.min(jnp.where(nz, pos, 16), axis=(-2, -1))
    last = jnp.max(jnp.where(nz, pos, -1), axis=(-2, -1))
    hidden = (last - first) > 3
    parity = (jnp.sum(jnp.abs(lv), axis=(-2, -1)) & 1)
    # sign of the first significant coefficient (1 = negative)
    first_sel = nz & (pos == first[..., None, None])
    want = (jnp.sum(jnp.where(first_sel, jnp.sign(lv), 0),
                    axis=(-2, -1)) < 0).astype(jnp.int32)
    need = hidden & (parity != want)
    last_sel = nz & (pos == last[..., None, None])
    step = jnp.where(jnp.abs(lv) >= 2, -1, 1) * jnp.sign(lv)
    lv = jnp.where(need[..., None, None] & last_sel, lv + step, lv)
    return lv.transpose(0, 1, 3, 2, 4).reshape(*lead, n, n)


def sbh_adjust_np(levels: np.ndarray) -> np.ndarray:
    """Numpy twin (oracle for tests / host-side paths)."""
    out = np.array(levels)
    n = out.shape[-1]
    pos = _diag_pos4()
    flat = out.reshape(-1, n, n)
    for b in range(flat.shape[0]):
        for gy in range(n // 4):
            for gx in range(n // 4):
                g = flat[b, gy * 4:gy * 4 + 4, gx * 4:gx * 4 + 4]
                ys, xs = np.nonzero(g)
                if len(ys) == 0:
                    continue
                p = pos[ys, xs]
                if p.max() - p.min() <= 3:
                    continue
                parity = int(np.abs(g).sum()) & 1
                fy, fx = ys[np.argmin(p)], xs[np.argmin(p)]
                want = 1 if g[fy, fx] < 0 else 0
                if parity == want:
                    continue
                ly, lx = ys[np.argmax(p)], xs[np.argmax(p)]
                s = 1 if g[ly, lx] > 0 else -1
                g[ly, lx] += -s if abs(g[ly, lx]) >= 2 else s
    return out
