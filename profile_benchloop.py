"""Reproduce bench_allintra_360p exactly, with per-output timestamps,
to find where encode_pipelined diverges from the hand loop (40 fps)."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")

from bench import synth_frames


def main():
    from x265amod_tpu.models.encoder import Encoder
    from x265amod_tpu.utils.params import param_default_preset

    w, h, nf, warm = 640, 360, 40, 8
    p = param_default_preset("ultrafast")
    p.width, p.height = w, h
    p.qp = 30
    p.keyint = 1
    p.ctu_size = 32
    enc = Encoder(p)
    frames = synth_frames(w, h, nf)

    t0 = time.time()
    for i, _ in enumerate(enc.encode_pipelined(frames[:warm])):
        print(f"warm out {i}: +{1e3 * (time.time() - t0):7.1f} ms")
        t0 = time.time()
    t0 = time.time()
    tstart = t0
    for i, _ in enumerate(enc.encode_pipelined(frames[warm:])):
        dt = time.time() - t0
        if dt > 3e-3:
            print(f"out {i}: +{1e3 * dt:7.1f} ms")
        t0 = time.time()
    dt = time.time() - tstart
    print(f"TOTAL {nf - warm} frames {1e3 * dt:.0f} ms -> "
          f"{(nf - warm) / dt:.1f} fps")


if __name__ == "__main__":
    main()
