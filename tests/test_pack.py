"""Sparse level packing roundtrip (ops/pack.py)."""

import numpy as np

from x265amod_tpu.ops.pack import pack_cap, pack_levels, unpack_levels


def test_pack_roundtrip():
    rng = np.random.default_rng(7)
    a = np.where(rng.random((37, 16, 16)) < 0.03,
                 rng.integers(-99, 100, (37, 16, 16)), 0).astype(np.int32)
    b = np.where(rng.random((37, 8, 8)) < 0.02,
                 rng.integers(-5, 6, (37, 8, 8)), 0).astype(np.int32)
    total = a.size + b.size
    cap = pack_cap(total)
    bm, vals, nnz, fits = (np.asarray(x) for x in
                           pack_levels([a, b], cap))
    assert bool(fits)
    assert int(nnz) == int((a != 0).sum() + (b != 0).sum())
    ua, ub = unpack_levels(bm, vals, nnz, [a.shape, b.shape])
    np.testing.assert_array_equal(ua, a)
    np.testing.assert_array_equal(ub, b)


def test_pack_overflow_flags():
    # capacity overflow
    a = np.ones((4, 16, 16), np.int32)
    _, _, _, fits = pack_levels([a], 128)
    assert not bool(np.asarray(fits))
    # large magnitudes fit (int16 values; round-5: the int8 variant
    # dense-fell-back on every frame with a strong DC)
    b = np.zeros((4, 16, 16), np.int32)
    b[0, 0, 0] = 300
    bm, vals, nnz, fits2 = (np.asarray(x) for x in
                            pack_levels([b], 128))
    assert bool(fits2)
    (ub,) = unpack_levels(bm, vals, nnz, [b.shape])
    np.testing.assert_array_equal(ub, b)


def test_pack_all_zero():
    a = np.zeros((3, 16, 16), np.int32)
    cap = pack_cap(a.size)
    bm, vals, nnz, fits = (np.asarray(x) for x in
                           pack_levels([a], cap))
    assert bool(fits) and int(nnz) == 0
    (ua,) = unpack_levels(bm, vals, nnz, [a.shape])
    np.testing.assert_array_equal(ua, a)


def test_mux_roundtrip():
    """mux_arrays -> single uint8 buffer -> demux_buffer recovers every
    array bit-exactly (incl. int16/int32/float32 bitcasts)."""
    import jax.numpy as jnp
    from x265amod_tpu.ops.pack import demux_buffer, mux_arrays
    rng = np.random.default_rng(5)
    arrs = [
        ("i8", rng.integers(-100, 100, (7, 3)).astype(np.int8)),
        ("u8", rng.integers(0, 256, (4,)).astype(np.uint8)),
        ("i16", rng.integers(-30000, 30000, (5, 2)).astype(np.int16)),
        ("i32", rng.integers(-2**30, 2**30, (6,)).astype(np.int32)),
        ("f32", rng.normal(size=(3, 3)).astype(np.float32)),
        ("b", np.array([True, False, True])),
    ]
    buf, spec = mux_arrays([(n, jnp.asarray(a)) for n, a in arrs])
    got = demux_buffer(np.asarray(buf), spec)
    for n, a in arrs:
        want = a.astype(np.uint8) if a.dtype == np.bool_ else a
        np.testing.assert_array_equal(got[n], want, err_msg=n)
