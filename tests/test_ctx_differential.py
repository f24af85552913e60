"""Differential oracle: the decoder's independently re-derived context
derivations (verify/ctx.py, table-driven from the spec) must agree
EXHAUSTIVELY with the encoder's formula-driven ones (cabac/syntax.py).
This converts the round-3/4 encoder/decoder common-mode risk into an
explicit cross-implementation check."""

import itertools

from x265amod_tpu.cabac import syntax as S
from x265amod_tpu.verify.ctx import (last_ctx_params_dec,
                                     last_prefix_min_dec, mpm_list_dec,
                                     sig_ctx_inc_dec)


def test_sig_ctx_inc_exhaustive():
    for log2 in (2, 3, 4, 5):
        n = 1 << log2
        for c_idx in (0, 1):
            for scan_idx in (0, 1, 2):
                for xc, yc in itertools.product(range(n), range(n)):
                    for cr, cb in itertools.product((0, 1), (0, 1)):
                        a = S.sig_ctx_inc(xc, yc, log2, c_idx,
                                          scan_idx, cr, cb)
                        b = sig_ctx_inc_dec(xc, yc, log2, c_idx,
                                            scan_idx, cr, cb)
                        assert a == b, (log2, c_idx, scan_idx, xc,
                                        yc, cr, cb, a, b)


def test_last_ctx_params_exhaustive():
    for log2 in (2, 3, 4, 5):
        for c_idx in (0, 1):
            assert S.last_ctx_params(log2, c_idx) == \
                last_ctx_params_dec(log2, c_idx)


def test_last_prefix_roundtrip():
    for g in range(10):
        assert S.last_prefix_min(g) == last_prefix_min_dec(g)
    # groupIdx and minInGroup must be inverse-consistent
    for pos in range(32):
        g = S.last_prefix_group(pos)
        assert last_prefix_min_dec(g) <= pos
        if g < 9:
            assert pos < last_prefix_min_dec(g + 1)


def test_mpm_list_exhaustive():
    for a in range(35):
        for b in range(35):
            assert S.mpm_list(a, b) == mpm_list_dec(a, b), (a, b)
