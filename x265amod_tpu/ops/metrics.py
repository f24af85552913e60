"""Quality metrics computed on device (role of the reference's PSNR /
SSIM computation inside the filter wave, `encoder/framefilter.cpp:654`
+ the ssim primitives of `common/pixel.cpp`).

PSNR rides the per-plane SSE sums the pipelines already produce; SSIM
is one batched computation over 8x8 windows (the reference's 8x8
block-based SSIM with the standard C1/C2 stabilizers), so neither
metric costs a host transfer beyond two scalars.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_C1 = (0.01 * 255) ** 2
_C2 = (0.03 * 255) ** 2


@functools.partial(jax.jit, static_argnames=("win",))
def ssim_plane(orig: jax.Array, rec: jax.Array, win: int = 8):
    """Mean SSIM over non-overlapping win x win windows, float32."""
    h, w = orig.shape
    hb, wb = h // win, w // win
    x = orig[:hb * win, :wb * win].astype(jnp.float32) \
        .reshape(hb, win, wb, win).transpose(0, 2, 1, 3)
    y = rec[:hb * win, :wb * win].astype(jnp.float32) \
        .reshape(hb, win, wb, win).transpose(0, 2, 1, 3)
    mx = jnp.mean(x, axis=(2, 3))
    my = jnp.mean(y, axis=(2, 3))
    vx = jnp.mean(x * x, axis=(2, 3)) - mx * mx
    vy = jnp.mean(y * y, axis=(2, 3)) - my * my
    cov = jnp.mean(x * y, axis=(2, 3)) - mx * my
    s = ((2 * mx * my + _C1) * (2 * cov + _C2)) / \
        ((mx * mx + my * my + _C1) * (vx + vy + _C2))
    return jnp.mean(s).astype(jnp.float32)


def ssim_plane_np(orig: np.ndarray, rec: np.ndarray,
                  win: int = 8) -> float:
    h, w = orig.shape
    hb, wb = h // win, w // win
    x = orig[:hb * win, :wb * win].astype(np.float64) \
        .reshape(hb, win, wb, win).transpose(0, 2, 1, 3)
    y = rec[:hb * win, :wb * win].astype(np.float64) \
        .reshape(hb, win, wb, win).transpose(0, 2, 1, 3)
    mx = x.mean(axis=(2, 3))
    my = y.mean(axis=(2, 3))
    vx = (x * x).mean(axis=(2, 3)) - mx * mx
    vy = (y * y).mean(axis=(2, 3)) - my * my
    cov = (x * y).mean(axis=(2, 3)) - mx * my
    s = ((2 * mx * my + _C1) * (2 * cov + _C2)) / \
        ((mx * mx + my * my + _C1) * (vx + vy + _C2))
    return float(s.mean())
