"""Sparse device->host packing of quantized coefficient levels.

The D2H link (especially over a tunneled TPU) is the encoder's
bottleneck after the device step: dense per-pixel level planes ship
~1 byte/coefficient while typically only 1-3% of coefficients are
nonzero (measured 2.2% at QP30, STATUS.md round-4 profile).  The
reference never faces this (CPU shared memory); the TPU-native analog
is to compress on device before crossing the link:

  bitmap: 1 bit per coefficient (significance, scan order = memory
          order) packed into uint8 on device,
  vals:   nonzero levels compacted by a cumsum-scatter into a
          fixed-capacity int16 buffer (static shapes under jit),
  nnz:    actual count; fits=False (capacity overflow) makes the host
          fall back to the dense int16 tensors, which are only then
          transferred.

Typical cost: 0.125 B/coeff bitmap + cap/total B/coeff values vs
1 B/coeff dense — a ~5x cut in D2H bytes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_POW2 = np.asarray([1, 2, 4, 8, 16, 32, 64, 128], np.int32)


def mux_arrays(named):
    """Device-side output mux: concatenate arrays of mixed dtypes into
    ONE uint8 buffer so the host needs a single D2H fetch.

    Measured on the tunneled TPU: every fetch costs ~26 ms of fixed
    latency + ~42 ms/MB — a collect path doing 7 small fetches pays
    ~180 ms in latency alone.  One mux fetch pays it once.

    named: list of (name, jax array).  Returns (buf uint8 [total],
    spec list of (name, shape, numpy dtype)) — the spec is host-side
    static data captured at trace time.
    """
    parts = []
    spec = []
    for name, a in named:
        if a.dtype == jnp.bool_:
            a = a.astype(jnp.uint8)
        spec.append((name, tuple(a.shape), np.dtype(str(a.dtype))))
        b = a if a.dtype == jnp.uint8 else \
            jax.lax.bitcast_convert_type(a, jnp.uint8)
        parts.append(b.reshape(-1))
    return jnp.concatenate(parts), spec


def demux_buffer(buf: np.ndarray, spec) -> dict:
    """Host-side inverse of mux_arrays for one buffer row."""
    out = {}
    off = 0
    mem = memoryview(np.ascontiguousarray(buf))
    for name, shape, dt in spec:
        n = int(np.prod(shape)) * dt.itemsize
        out[name] = np.frombuffer(mem[off:off + n], dt).reshape(shape)
        off += n
    return out


def mux_arrays_np(named):
    """Host-side input mux (H2D twin of mux_arrays): concatenate numpy
    arrays of mixed dtypes into ONE uint8 buffer so dispatch pays the
    tunnel's ~26 ms fixed transfer latency once instead of per array.
    Returns (buf uint8 [total], spec of (name, shape, dtype))."""
    parts = []
    spec = []
    for name, a in named:
        a0 = np.asarray(a)
        spec.append((name, tuple(a0.shape), a0.dtype))
        parts.append(np.ascontiguousarray(a0).reshape(-1)
                     .view(np.uint8))
    return np.concatenate(parts), tuple(spec)


def demux_device(buf, spec) -> dict:
    """Device-side inverse of mux_arrays_np (traced under jit): slice +
    bitcast each segment back to its dtype/shape."""
    import jax
    out = {}
    off = 0
    for name, shape, dt in spec:
        w = np.dtype(dt).itemsize
        nb = int(np.prod(shape)) * w
        seg = buf[off:off + nb]
        if w == 1:
            arr = seg.reshape(shape).astype(jnp.dtype(dt))
        else:
            arr = jax.lax.bitcast_convert_type(
                seg.reshape(-1, w), jnp.dtype(dt)).reshape(shape)
        out[name] = arr
        off += nb
    return out


def pack_cap(total: int, frac: int = 16) -> int:
    """Static value capacity: total/frac coefficients, padded so the
    int8 buffer is lane-aligned."""
    return max(128, (-(-total // frac) + 127) // 128 * 128)


def pack_levels(arrs, cap: int):
    """Device-side pack of a list of integer level tensors (any
    shapes; flattened in order).  Returns (bitmap uint8[ceil(T/8)],
    vals int16[cap], nnz int32, fits bool).

    Values are int16: levels are clipped to +-32767 by quant, so the
    pack never magnitude-overflows (round-5 fix — the int8 variant
    fell back to the dense transfer on EVERY frame with a strong DC,
    costing ~500 ms/batch of queued D2H)."""
    flat = jnp.concatenate([a.reshape(-1).astype(jnp.int32)
                            for a in arrs])
    total = flat.shape[0]
    padn = (-total) % 8
    if padn:
        flat = jnp.concatenate([flat, jnp.zeros((padn,), jnp.int32)])
    nz = flat != 0
    bitmap = jnp.sum(nz.reshape(-1, 8).astype(jnp.int32)
                     * jnp.asarray(_POW2)[None, :], axis=1) \
        .astype(jnp.uint8)
    pos = jnp.cumsum(nz.astype(jnp.int32)) - 1
    nnz = pos[-1] + 1
    vals = jnp.zeros((cap,), jnp.int16).at[
        jnp.where(nz, pos, cap)].set(
        jnp.clip(flat, -32768, 32767).astype(jnp.int16), mode="drop")
    fits = nnz <= cap
    return bitmap, vals, nnz.astype(jnp.int32), fits


def unpack_levels(bitmap: np.ndarray, vals: np.ndarray, nnz: int,
                  shapes) -> list[np.ndarray]:
    """Host-side inverse: list of int32 arrays with the given shapes."""
    mask = np.unpackbits(np.asarray(bitmap), bitorder="little") \
        .astype(bool)
    out = np.zeros(mask.size, np.int32)
    out[mask] = np.asarray(vals)[:int(nnz)].astype(np.int32)
    res = []
    off = 0
    for shp in shapes:
        n = int(np.prod(shp))
        res.append(out[off:off + n].reshape(shp))
        off += n
    return res
