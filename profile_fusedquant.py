"""Measured decision for ops/pallas_kernels.fused_fwd_quant: time the
Pallas fused forward-transform+quant against the XLA path
quant(fwd_transform(...)) (now exact-f32 MXU matmuls) at the shapes the
pipelines actually run.  Whichever wins gets wired; the loser is
documented with this measurement (VERDICT round-4 weak #2).
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, n_rep=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n_rep):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / n_rep


def main():
    from x265amod_tpu.ops.pallas_kernels import fused_fwd_quant
    from x265amod_tpu.ops.quant import quant
    from x265amod_tpu.ops.transforms import fwd_transform

    rng = np.random.default_rng(0)
    # shapes from the 720p P pipeline: 3600 16-blocks (inter trial),
    # 3600x4 RD candidates (intra trial), 900 32-blocks
    cases = [("16x16 x3600", (3600, 16, 16)),
             ("16x16 x14400", (14400, 16, 16)),
             ("32x32 x900", (900, 32, 32))]
    for name, shp in cases:
        resi = jnp.asarray(rng.integers(-255, 256, shp), jnp.int32)
        qp_blk = jnp.full((shp[0],), 32, jnp.int32)
        qp3 = qp_blk.reshape((-1,) + (1,) * (len(shp) - 1))

        xla = jax.jit(lambda r, q: quant(fwd_transform(r), q,
                                         intra=False))
        t_xla = _time(xla, resi, qp3)
        try:
            pk = jax.jit(lambda r, q: fused_fwd_quant(r, q,
                                                      intra=False))
            t_pal = _time(pk, resi, qp_blk)
            a = np.asarray(xla(resi, qp3))
            b = np.asarray(pk(resi, qp_blk))
            match = np.array_equal(a, b)
        except Exception as e:  # noqa: BLE001
            t_pal, match = float("nan"), f"ERROR {e}"
        print(f"{name:14s}: xla {1e3 * t_xla:7.3f} ms   "
              f"pallas {1e3 * t_pal:7.3f} ms   match={match}")


if __name__ == "__main__":
    main()
