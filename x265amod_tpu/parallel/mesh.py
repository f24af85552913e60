"""Device-mesh parallelism for the encoder.

TPU-first replacement for the reference's frame-thread pool
(`encoder/frameencoder.cpp` thread-per-frame + recon-row waits,
`doc/reST/threading.rst:123-215`): frames are sharded across devices on
a ``frame`` mesh axis (GOP/frame parallelism); per-frame rate-control /
complexity statistics ride an all-reduce (`jax.lax.psum`) — the TPU
analog of the reference's shared-memory RC chain
(`common/ringmem.cpp`, SURVEY.md §2.2 "distributed communication
backend" row).

CTU-row band sharding with recon-halo exchange (the WPP analog across
chips) is the phase-5 extension point; the mesh layout already reserves
a ``row`` axis for it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_frame: int | None = None, n_row: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_frame is None:
        n_frame = len(devices) // n_row
    dev = np.asarray(devices[:n_frame * n_row]).reshape(n_frame, n_row)
    return Mesh(dev, axis_names=("frame", "row"))


def frame_parallel_step(mesh: Mesh, frame_encode_fn):
    """Wrap a single-frame encode fn into a frame-sharded step.

    frame_encode_fn(y, cb, cr, qp, qp_cb, qp_cr, lam, slice_qp) ->
    pytree of per-frame outputs.  The wrapped step takes batched inputs
    with a leading frames axis sharded over the ``frame`` mesh axis,
    runs the wavefront encode per frame, and all-reduces summary stats
    (total distortion proxy) across the mesh — the RC aggregation
    collective.
    """
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("frame"), P("frame"), P("frame"), P(), P(), P(),
                  P(), P()),
        out_specs=(P("frame"), P()),
        check_vma=False)
    def step(y, cb, cr, qp, qp_cb, qp_cr, lam, slice_qp):
        out = jax.vmap(
            lambda a, b, c: frame_encode_fn(a, b, c, qp, qp_cb, qp_cr,
                                            lam, slice_qp))(y, cb, cr)
        # cross-frame stat reduction (ABR/VBV feed): nonzero-level count
        # as the complexity proxy, all-reduced over the mesh
        levels = out[1]
        complexity = jnp.sum((levels != 0).astype(jnp.int32))
        total = jax.lax.psum(jax.lax.psum(complexity, "frame"), "row")
        return out, total

    return step
