"""Device/host/transfer time breakdown for the two bench configs.

Usage: python profile_bench.py [intra|p|both]
Prints a per-stage table: dispatch (host->device + trace), device
(block_until_ready), D2H (collect -> numpy), host CABAC, NAL assembly.
"""

import sys
import time

import numpy as np

from bench import synth_frames


def prof_intra():
    import jax
    from x265amod_tpu.models.encoder import Encoder
    from x265amod_tpu.utils.params import param_default_preset

    w, h, nf = 640, 360, 32
    p = param_default_preset("ultrafast")
    p.width, p.height = w, h
    p.qp = 30
    p.keyint = 1
    p.ctu_size = 32
    enc = Encoder(p)
    frames = synth_frames(w, h, nf)
    fe = enc.frame_encoder
    bsz = enc.BATCH_FRAMES

    from x265amod_tpu.models.encoder import _pad_to_ctu
    ys = np.stack([_pad_to_ctu(f[0], 32) for f in frames[:bsz]])
    cbs = np.stack([_pad_to_ctu(f[1], 16) for f in frames[:bsz]])
    crs = np.stack([_pad_to_ctu(f[2], 16) for f in frames[:bsz]])

    # warmup/compile
    dev = fe.encode_batch_async(ys, cbs, crs, 30)
    jax.block_until_ready(dev)
    results = fe.collect_batch(dev)

    n_rep = 4
    t_disp = t_dev = t_d2h = t_cabac = t_nal = 0.0
    for _ in range(n_rep):
        t0 = time.time()
        dev = fe.encode_batch_async(ys, cbs, crs, 30)
        t1 = time.time()
        jax.block_until_ready(dev)
        t2 = time.time()
        results = fe.collect_batch(dev)
        t3 = time.time()
        payloads = [enc._cabac_intra(r, 30, None) for r in results]
        t4 = time.time()
        for res, (payload, eo) in zip(results, payloads):
            enc._assemble_intra_nal(res, 30, payload, eo, t4)
        t5 = time.time()
        t_disp += t1 - t0
        t_dev += t2 - t1
        t_d2h += t3 - t2
        t_cabac += t4 - t3
        t_nal += t5 - t4
    n = n_rep * bsz
    print(f"== all-intra 360p batched (per frame, batch={bsz}) ==")
    print(f"dispatch : {1e3 * t_disp / n:8.2f} ms")
    print(f"device   : {1e3 * t_dev / n:8.2f} ms")
    print(f"d2h      : {1e3 * t_d2h / n:8.2f} ms")
    print(f"cabac    : {1e3 * t_cabac / n:8.2f} ms")
    print(f"nal      : {1e3 * t_nal / n:8.2f} ms")
    tot = t_disp + t_dev + t_d2h + t_cabac + t_nal
    print(f"total    : {1e3 * tot / n:8.2f} ms -> {n / tot:.1f} fps "
          f"(serial; pipeline overlaps dev with host)")


def prof_p():
    import jax
    from x265amod_tpu.models.encoder import Encoder
    from x265amod_tpu.utils.params import param_default_preset

    w, h, nf = 1280, 720, 10
    p = param_default_preset("superfast")
    p.width, p.height = w, h
    p.qp = 32
    p.keyint = 250
    p.bframes = 0
    p.ctu_size = 32
    p.aq_mode = 0
    p.cutree = False
    enc = Encoder(p)
    frames = synth_frames(w, h, nf, seed=2)

    # frame 0 = I (compile both pipelines)
    enc.encode_push(*frames[0])
    enc.encode_push(*frames[1])  # P compile
    enc.encode_push(*frames[2])

    ie = enc.inter_encoder
    t_disp = t_dev = t_d2h = t_cabac = 0.0
    n = 0
    for fr in frames[3:]:
        yp = np.asarray(fr[0])
        cbp = np.asarray(fr[1])
        crp = np.asarray(fr[2])
        t0 = time.time()
        entries = enc._push_display_frame(yp, cbp, crp)
        assert len(entries) == 1
        e = entries[0]
        pend = enc._dispatch_entry(e, False)
        t1 = time.time()
        jax.block_until_ready(pend["dev"])
        t2 = time.time()
        res = ie.collect(pend["dev"], want_recon=False)
        t3 = time.time()
        enc._cabac_inter(res, pend["qp"], None)
        t4 = time.time()
        t_disp += t1 - t0
        t_dev += t2 - t1
        t_d2h += t3 - t2
        t_cabac += t4 - t3
        n += 1
    print(f"== low-delay P 720p (per frame, n={n}) ==")
    print(f"dispatch : {1e3 * t_disp / n:8.2f} ms")
    print(f"device   : {1e3 * t_dev / n:8.2f} ms")
    print(f"d2h      : {1e3 * t_d2h / n:8.2f} ms")
    print(f"cabac    : {1e3 * t_cabac / n:8.2f} ms")
    tot = t_disp + t_dev + t_d2h + t_cabac
    print(f"total    : {1e3 * tot / n:8.2f} ms -> {n / tot:.1f} fps")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("intra", "both"):
        prof_intra()
    if which in ("p", "both"):
        prof_p()
