"""P-slice CTU32 quadtree: decode bit-exactness across the tool matrix,
split engagement, RD gain vs flat CTU16, and native/Python oracle byte
identity (VERDICT round-2 item #2: extend the CU quadtree to inter)."""

import numpy as np
import pytest

import x265amod_tpu.native as native_mod
from x265amod_tpu.models.encoder import Encoder
from x265amod_tpu.utils.params import param_default_preset
from x265amod_tpu.verify.decoder import decode_stream


def _frames(n, w, h, seed=3):
    """Mix of global motion (skip/merge fodder) and local churn
    (split/intra fodder)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (110 + 45 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
            + rng.normal(0, 5, (h, w))).clip(0, 255).astype(np.uint8)
    out = []
    for i in range(n):
        y = np.roll(base, (i, 2 * i), (0, 1)).copy()
        y[10 + 3 * i:26 + 3 * i, 20 + 5 * i:36 + 5 * i] = \
            rng.integers(0, 255, (16, 16))
        cb = (128 + 18 * np.sin(xx[::2, ::2] / 15.0 + i)).clip(0, 255) \
            .astype(np.uint8)
        cr = (128 - 18 * np.cos(yy[::2, ::2] / 11.0)).clip(0, 255) \
            .astype(np.uint8)
        out.append((y, cb, cr))
    return out


def _cfg(w, h, **kw):
    p = param_default_preset("medium")
    p.width, p.height = w, h
    p.qp = 30
    p.keyint = 250
    p.bframes = 0
    p.ctu_size = 32
    p.scenecut = 0
    p.aq_mode = 0
    p.cutree = False
    p.deblock = False
    p.sao = False
    p.wpp = False
    for k, v in kw.items():
        setattr(p, k, v)
    return p


def _encode(p, frames, ret=True):
    enc = Encoder(p.copy())
    nals = b""
    recons = []
    for f in frames:
        for out in enc.encode_push(*f, return_recon=ret):
            nals += out.nals
            recons.append(out.recon)
    for out in enc.flush(return_recon=ret):
        nals += out.nals
        recons.append(out.recon)
    return nals, recons


CONFIGS = [
    ("plain", {}),
    ("deblock", dict(deblock=True)),
    ("sao-wpp", dict(sao=True, wpp=True)),
    ("aq-deblock-sao-wpp", dict(aq_mode=2, deblock=True, sao=True,
                                wpp=True)),
]


@pytest.mark.parametrize("name,kw", CONFIGS, ids=[c[0] for c in CONFIGS])
def test_ptree_encode_decode_bitexact(name, kw):
    frames = _frames(4, 96, 64)
    nals, recons = _encode(_cfg(96, 64, **kw), frames)
    dec = decode_stream(nals)
    assert len(dec) == 4
    for i, (d, r) in enumerate(zip(dec, recons)):
        np.testing.assert_array_equal(d.y, r[0], err_msg=f"{name} f{i} y")
        np.testing.assert_array_equal(d.cb, r[1],
                                      err_msg=f"{name} f{i} cb")
        np.testing.assert_array_equal(d.cr, r[2],
                                      err_msg=f"{name} f{i} cr")


def test_ptree_splits_engage():
    """The wavefront decide pass must actually choose split on churny
    content AND no-split on static content (both hypotheses live)."""
    frames = _frames(3, 96, 64)
    p = _cfg(96, 64)
    enc = Encoder(p)
    splits = []
    for f in frames:
        for out in enc.encode_push(*f):
            pass
        # inspect the device result of the last P dispatch through the
        # DPB side door: re-run a direct encode for the last pair
    # direct: encode frame 1 against frame 0's recon
    from x265amod_tpu.models.inter_tree import InterTreeEncoder
    import jax.numpy as jnp
    te = InterTreeEncoder(96, 64)
    y0, cb0, cr0 = frames[0]
    y1 = frames[1][0]
    ref = (jnp.asarray(y0.astype(np.int32)),
           jnp.asarray(cb0.astype(np.int32)),
           jnp.asarray(cr0.astype(np.int32)))
    res = te.collect(te.encode_async(y1, frames[1][1], frames[1][2],
                                     ref, 30))
    assert res.split.any(), "no CTU ever split"
    assert (res.split == 0).any(), "every CTU split (CU32 path dead)"
    # unsplit CTUs replicate their decision onto all four cells
    hc, wc = res.split.shape
    k = res.kinds.reshape(hc, 2, wc, 2)
    for cy in range(hc):
        for cx in range(wc):
            if not res.split[cy, cx]:
                assert len(set(k[cy, :, cx, :].reshape(-1).tolist())) \
                    == 1


def _sse_of(psnr_y, npix):
    """Invert the per-frame luma PSNR back to SSE."""
    return float(npix * 255.0 ** 2 / (10.0 ** (psnr_y / 10.0)))

def test_ptree_beats_flat16_rd():
    """Tree must not lose to flat CTU16 on bits at >= equal PSNR
    (the CU32 skip/merge + TU32 coding gain)."""
    frames = _frames(6, 160, 96, seed=7)

    def run(ctu):
        p = _cfg(160, 96, deblock=True)
        p.qp = 32
        p.ctu_size = ctu
        enc = Encoder(p)
        bits = 0
        sse = 0.0
        n = 0
        for f in frames:
            for out in enc.encode_push(*f):
                bits += out.stats.bits
                sse += _sse_of(out.stats.psnr_y, 160 * 96)
                n += 1
        for out in enc.flush():
            bits += out.stats.bits
            sse += _sse_of(out.stats.psnr_y, 160 * 96)
            n += 1
        return bits, sse

    b16, d16 = run(16)
    b32, d32 = run(32)
    # RD-cost comparison at the encode lambda (the two encoders sit at
    # different bit/distortion points; a pointwise PSNR margin cannot
    # rank them): the CU32 tree must not LOSE in J = D + lambda*R
    from x265amod_tpu.utils.lambdas import lambda2_of
    lam = float(lambda2_of(np.int32(32)))
    j16 = d16 + lam * b16
    j32 = d32 + lam * b32
    assert j32 < j16 * 1.01, (j16, j32, b16, b32, d16, d32)


def _cfg_b(w, h, **kw):
    p = _cfg(w, h)
    p.bframes = 3
    p.rc_lookahead = 4
    for k, v in kw.items():
        setattr(p, k, v)
    return p


def _encode_by_poc(p, frames):
    enc = Encoder(p.copy())
    nals = b""
    by_poc = {}
    for f in frames:
        for out in enc.encode_push(*f, return_recon=True):
            nals += out.nals
            by_poc[out.stats.poc] = out.recon
    for out in enc.flush(return_recon=True):
        nals += out.nals
        by_poc[out.stats.poc] = out.recon
    return nals, by_poc


B_CONFIGS = [
    ("plain", {}),
    ("aq-deblock-sao", dict(aq_mode=2, cutree=True, deblock=True,
                            sao=True)),
    ("wpp", dict(wpp=True)),
]


@pytest.mark.parametrize("name,kw", B_CONFIGS,
                         ids=[c[0] for c in B_CONFIGS])
def test_btree_encode_decode_bitexact(name, kw):
    frames = _frames(6, 96, 64)
    nals, by_poc = _encode_by_poc(_cfg_b(96, 64, **kw), frames)
    dec = decode_stream(nals)
    assert len(dec) == 6
    for d in dec:
        r = by_poc[d.poc]
        np.testing.assert_array_equal(d.y, r[0],
                                      err_msg=f"{name} poc{d.poc} y")
        np.testing.assert_array_equal(d.cb, r[1],
                                      err_msg=f"{name} poc{d.poc} cb")
        np.testing.assert_array_equal(d.cr, r[2],
                                      err_msg=f"{name} poc{d.poc} cr")


def test_btree_beats_flat16_rd():
    frames = _frames(8, 160, 96, seed=7)

    def run(ctu):
        p = _cfg_b(160, 96, deblock=True)
        p.qp = 32
        p.ctu_size = ctu
        enc = Encoder(p)
        bits = 0
        sse = 0.0
        for f in frames:
            for out in enc.encode_push(*f):
                bits += out.stats.bits
                sse += _sse_of(out.stats.psnr_y, 160 * 96)
        for out in enc.flush():
            bits += out.stats.bits
            sse += _sse_of(out.stats.psnr_y, 160 * 96)
        return bits, sse

    b16, d16 = run(16)
    b32, d32 = run(32)
    from x265amod_tpu.utils.lambdas import lambda2_of
    lam = float(lambda2_of(np.int32(32)))
    assert d32 + lam * b32 < (d16 + lam * b16) * 1.01, \
        (b16, b32, d16, d32)


def test_btree_native_matches_python(monkeypatch):
    assert native_mod.get_cabac_lib() is not None, "native lib missing"
    frames = _frames(6, 96, 64)
    p = _cfg_b(96, 64, aq_mode=2, cutree=True, deblock=True, sao=True)
    nat, _ = _encode(p, frames, ret=False)
    real = native_mod.encode_slice_native
    monkeypatch.setattr(native_mod, "encode_slice_native",
                        lambda *a, **k: None)
    py, _ = _encode(p, frames, ret=False)
    monkeypatch.setattr(native_mod, "encode_slice_native", real)
    assert nat == py, "B-tree native payload diverges from oracle"


def test_ptree_native_matches_python(monkeypatch):
    assert native_mod.get_cabac_lib() is not None, "native lib missing"
    frames = _frames(4, 96, 64)
    p = _cfg(96, 64, aq_mode=2, deblock=True, sao=True, wpp=True)
    nat, _ = _encode(p, frames, ret=False)
    real = native_mod.encode_slice_native
    monkeypatch.setattr(native_mod, "encode_slice_native",
                        lambda *a, **k: None)
    py, _ = _encode(p, frames, ret=False)
    monkeypatch.setattr(native_mod, "encode_slice_native", real)
    assert nat == py, "P-tree native payload diverges from oracle"
