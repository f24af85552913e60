"""Device-step stage breakdown for the two bench configs.

Times each pipeline stage in isolation via probe early-returns
(inter_tree._encode(probe=k)) and standalone jits of the intra
estimate pass, so optimization targets the measured hot stage instead
of guesses.  Usage: python profile_stages.py [intra|p|both]
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")

import numpy as np

from bench import synth_frames


def _time(fn, n_rep=4):
    import jax
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n_rep):
        out = fn()
        jax.block_until_ready(out)
    return (time.time() - t0) / n_rep


def prof_intra():
    import jax
    import jax.numpy as jnp
    from x265amod_tpu.models.encoder import Encoder, _pad_to_ctu
    from x265amod_tpu.models.intra_tree import IntraTreeEncoder
    from x265amod_tpu.utils.params import param_default_preset

    w, h, bsz = 640, 360, 16
    p = param_default_preset("ultrafast")
    p.width, p.height = w, h
    p.qp = 30
    p.keyint = 1
    p.ctu_size = 32
    enc = Encoder(p)
    fe = enc.frame_encoder
    frames = synth_frames(w, h, bsz)
    ys = np.stack([_pad_to_ctu(f[0], 32) for f in frames])
    cbs = np.stack([_pad_to_ctu(f[1], 16) for f in frames])
    crs = np.stack([_pad_to_ctu(f[2], 16) for f in frames])

    maps = fe._maps(30, None)
    arrs = [jnp.asarray(ys, jnp.uint8), jnp.asarray(cbs, jnp.uint8),
            jnp.asarray(crs, jnp.uint8)]
    arrs += [jnp.asarray(np.broadcast_to(m, (bsz,) + m.shape))
             for m in maps]
    qps = jnp.full((bsz,), 30, jnp.int32)

    # estimate pass alone (maps subset: qp16, qpcb16, lam16, qp32,
    # qpcb32, lam32 = maps[0], maps[1], maps[3], maps[4], maps[5], maps[7])
    est = jax.jit(jax.vmap(fe._estimate_frame))
    est_args = (arrs[0], arrs[1], arrs[2], arrs[3], arrs[4], arrs[6],
                arrs[7], arrs[8], arrs[10])
    t_est = _time(lambda: est(*est_args))
    print(f"intra estimate pass      : {1e3 * t_est / bsz:7.2f} ms/frame")

    # full fast step, filters on (the shipped config)
    t_full = _time(lambda: fe._step_fast_batch(*arrs, qps))
    print(f"intra full (deblk+sao)   : {1e3 * t_full / bsz:7.2f} ms/frame")

    # no-filter variant isolates the deblock+sao tail
    fe2 = IntraTreeEncoder(enc.pad_w, enc.pad_h, deblock=False,
                           sao=False, wpp=p.wpp,
                           sign_hide=enc.pps.sign_data_hiding)
    t_nf = _time(lambda: fe2._step_fast_batch(*arrs, qps))
    print(f"intra full (no filters)  : {1e3 * t_nf / bsz:7.2f} ms/frame")
    print(f"  -> commit scan ~= {1e3 * (t_nf - t_est) / bsz:7.2f}, "
          f"filters ~= {1e3 * (t_full - t_nf) / bsz:7.2f} ms/frame")


def prof_p():
    import jax
    import jax.numpy as jnp
    from x265amod_tpu.models.encoder import Encoder
    from x265amod_tpu.utils.params import param_default_preset

    w, h = 1280, 720
    p = param_default_preset("superfast")
    p.width, p.height = w, h
    p.qp = 32
    p.keyint = 250
    p.bframes = 0
    p.ctu_size = 32
    p.aq_mode = 0
    p.cutree = False
    enc = Encoder(p)
    frames = synth_frames(w, h, 3, seed=2)
    ie = enc.inter_encoder
    # a stand-in reference with recon shapes/dtypes (skips compiling
    # the intra pipeline just to seed the DPB; ME timing is identical)
    from x265amod_tpu.models.encoder import _pad_to_ctu
    ref = (jnp.asarray(_pad_to_ctu(frames[0][0], 32), jnp.uint8),
           jnp.asarray(_pad_to_ctu(frames[0][1], 16), jnp.uint8),
           jnp.asarray(_pad_to_ctu(frames[0][2], 16), jnp.uint8))

    yp = _pad_to_ctu(np.asarray(frames[1][0]), 32)
    cbp = _pad_to_ctu(np.asarray(frames[1][1]), 16)
    crp = _pad_to_ctu(np.asarray(frames[1][2]), 16)
    maps = ie._maps(32, None)
    args = [jnp.asarray(yp, jnp.uint8), jnp.asarray(cbp, jnp.uint8),
            jnp.asarray(crp, jnp.uint8), *ref,
            *(jnp.asarray(m) for m in maps), jnp.asarray(32, jnp.int32)]

    prev = 0.0
    names = {1: "me+trials+intra est", 2: "decide scan",
             3: "final mc+residuals", 4: "commit scan"}
    for k in (1, 2, 3, 4):
        step = jax.jit(functools.partial(ie._encode, probe=k))
        t = _time(lambda s=step: s(*args))
        print(f"p720 through {names[k]:20s}: {1e3 * t:7.1f} ms "
              f"(+{1e3 * (t - prev):6.1f})")
        prev = t
    t_full = _time(lambda: ie._step(*args))
    print(f"p720 full (filters+mux)          : {1e3 * t_full:7.1f} ms "
          f"(+{1e3 * (t_full - prev):6.1f})")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("intra", "both"):
        prof_intra()
    if which in ("p", "both"):
        prof_p()
