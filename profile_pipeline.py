"""Timestamp every phase of the batched all-intra pipeline loop to find
where the end-to-end walltime diverges from the serial stage sum
(bench 12 fps vs serial 31 fps, round 5)."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")

import numpy as np

from bench import synth_frames


def main():
    import jax
    from x265amod_tpu.models.encoder import Encoder, _pad_to_ctu
    from x265amod_tpu.utils.params import param_default_preset

    w, h, nf = 640, 360, 48
    p = param_default_preset("ultrafast")
    p.width, p.height = w, h
    p.qp = 30
    p.keyint = 1
    p.ctu_size = 32
    enc = Encoder(p)
    frames = synth_frames(w, h, nf)
    bsz = enc.BATCH_FRAMES
    fe = enc.frame_encoder

    padded = [( _pad_to_ctu(f[0], 32), _pad_to_ctu(f[1], 16),
                _pad_to_ctu(f[2], 16)) for f in frames]

    # warm both steps
    grp = padded[:bsz]
    dev = fe.encode_batch_async(np.stack([f[0] for f in grp]),
                                np.stack([f[1] for f in grp]),
                                np.stack([f[2] for f in grp]), 30)
    jax.block_until_ready(dev)
    fe.collect_batch(dev)

    def ts(label, t0):
        t = time.time()
        print(f"  {label:28s} +{1e3 * (t - t0):7.1f} ms")
        return t

    n_groups = nf // bsz
    pending = None
    tstart = time.time()
    for g in range(n_groups):
        print(f"group {g}:")
        t = time.time()
        grp = padded[g * bsz:(g + 1) * bsz]
        ys = np.stack([f[0] for f in grp])
        cbs = np.stack([f[1] for f in grp])
        crs = np.stack([f[2] for f in grp])
        t = ts("stack", t)
        if pending is not None:
            jax.block_until_ready(pending[0])
            t = ts("wait prev device", t)
            try:
                pending[0].copy_to_host_async()
            except Exception as e:  # noqa: BLE001
                print("   copy_to_host_async failed:", e)
            t = ts("start async copy", t)
        dev = fe.encode_batch_async(ys, cbs, crs, 30)
        t = ts("dispatch", t)
        if pending is not None:
            results = fe.collect_batch(pending)
            t = ts("collect (D2H wait)", t)
            payloads = [enc._cabac_intra(r, 30, None) for r in results]
            t = ts("cabac", t)
        pending = dev
    jax.block_until_ready(pending[0])
    results = fe.collect_batch(pending)
    dt = time.time() - tstart
    print(f"TOTAL {n_groups} groups, {1e3 * dt:.0f} ms -> "
          f"{n_groups * bsz / dt:.1f} fps")


if __name__ == "__main__":
    main()
