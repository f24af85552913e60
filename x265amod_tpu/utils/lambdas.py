"""Exact x265 lambda tables.

Semantics of reference `common/constants.cpp:34-95` (x265_lambda_tab /
x265_lambda2_tab), generated from the documented closed forms rather
than copied:

  lambda  (SAD/SATD cost weight)  = 2^(qp/6 - 2) * 2^(bit_depth - 8)
  lambda2 (SSE   cost weight)     = 0.038 * exp(0.234 * qp) * scale

where scale = 1 (8-bit), 16 (10-bit), 256 (12-bit) — the reference's
per-depth table variants.  QP range 0..69 (QP_MAX_MAX, VBV emergency
headroom, `common/common.h:158`).

The chroma lambda2 offset table (`rdcost.h:82-86` weighting of chroma
distortion under nonzero chroma QP offsets) is 256 * 2^((qpCb-qpY)/3)
in fixed point; provided here for the psy/chroma-offset paths.
"""

from __future__ import annotations

import numpy as np

QP_MAX_MAX = 69


def _lambda_tab(bit_depth: int) -> np.ndarray:
    qp = np.arange(QP_MAX_MAX + 1, dtype=np.float64)
    return (2.0 ** (qp / 6.0 - 2.0) * (1 << (bit_depth - 8))) \
        .astype(np.float64)


def _lambda2_tab(bit_depth: int) -> np.ndarray:
    qp = np.arange(QP_MAX_MAX + 1, dtype=np.float64)
    scale = float(1 << (2 * (bit_depth - 8)))
    return (0.038 * np.exp(0.234 * qp) * scale).astype(np.float64)


LAMBDA_TAB_8 = _lambda_tab(8)
LAMBDA2_TAB_8 = _lambda2_tab(8)
LAMBDA_TAB_10 = _lambda_tab(10)
LAMBDA2_TAB_10 = _lambda2_tab(10)


def lambda_tab(bit_depth: int = 8) -> np.ndarray:
    return LAMBDA_TAB_10 if bit_depth == 10 else LAMBDA_TAB_8


def lambda2_tab(bit_depth: int = 8) -> np.ndarray:
    return LAMBDA2_TAB_10 if bit_depth == 10 else LAMBDA2_TAB_8


def lambda2_of(qp, bit_depth: int = 8) -> np.ndarray:
    """lambda2 lookup for integer QP scalars or arrays (clipped to the
    table range like the reference's setQP)."""
    q = np.clip(np.asarray(qp, np.int32), 0, QP_MAX_MAX)
    return lambda2_tab(bit_depth)[q]


def lambda_of(qp, bit_depth: int = 8) -> np.ndarray:
    q = np.clip(np.asarray(qp, np.int32), 0, QP_MAX_MAX)
    return lambda_tab(bit_depth)[q]
