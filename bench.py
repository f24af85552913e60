"""Benchmark: BASELINE.md measurement config 1 (all-intra 360p fixed QP).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline reference: the repository's reference encoder publishes no
absolute fps (BASELINE.md); the north-star is "encode fps/chip > x265 on
a 32-core CPU".  We anchor against an estimated 300 fps for x265
ultrafast all-intra 360p on a 32-core host (conservative public
ballpark) until a measured x265 build lands in-tree.
"""

import json
import sys
import time

import numpy as np

X265_ULTRAFAST_360P_ALLINTRA_FPS_EST = 300.0


def synth_frames(w, h, n, seed=0):
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    frames = []
    for t in range(n):
        y = (128 + 80 * np.sin((xx + 3 * t) / 11.0) *
             np.cos((yy - 2 * t) / 7.0) +
             rng.normal(0, 4, (h, w))).clip(0, 255).astype(np.uint8)
        cb = (128 + 30 * np.sin((xx[::2, ::2] + t) / 19.0)) \
            .clip(0, 255).astype(np.uint8)
        cr = (128 - 30 * np.cos((yy[::2, ::2] + t) / 23.0)) \
            .clip(0, 255).astype(np.uint8)
        frames.append((y, cb, cr))
    return frames


def main():
    from x265amod_tpu.models.encoder import Encoder
    from x265amod_tpu.utils.params import param_default_preset

    w, h, nf, warm = 640, 360, 40, 8
    p = param_default_preset("ultrafast")
    p.width, p.height = w, h
    p.qp = 30
    p.keyint = 1
    p.ctu_size = 32              # CU-quadtree pipeline (round-2 default)
    enc = Encoder(p)
    frames = synth_frames(w, h, nf)

    # warmup: one full batch group (compiles the vmapped batch step)
    for _ in enc.encode_pipelined(frames[:warm]):
        pass
    t0 = time.time()
    bits = 0
    for out in enc.encode_pipelined(frames[warm:]):
        bits += out.stats.bits
    dt = time.time() - t0
    fps = (nf - warm) / dt
    s = enc.summary()
    sys.stderr.write(
        f"bench: {nf - 1} frames 640x360 all-intra QP30: {fps:.3f} fps, "
        f"PSNR-Y {s['psnr_y']:.2f} dB, {s['bitrate_kbps']:.0f} kbps\n")
    print(json.dumps({
        "metric": "enc_fps_360p_allintra",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / X265_ULTRAFAST_360P_ALLINTRA_FPS_EST, 4),
    }))


if __name__ == "__main__":
    main()
