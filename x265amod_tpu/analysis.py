"""Analysis save/load (role of reference `Encoder::writeAnalysisFile` /
`readAnalysisFile`, encoder.cpp:5569/4439, and the x265_analysis_*data
structs of x265.h:117-236).

Per-frame encoder decisions are serialized so a later pass (or a
different ladder rung) can skip the work that produced them:

  level 1  — lookahead reuse: slice decisions (scene cuts) + per-CTU
             QP offset maps (AQ + CU-tree).  On load the encoder's
             Lookahead is bypassed entirely.
  level 10 — full CU data additionally recorded (kinds, inter dir,
             MVs, intra modes) for cross-pass mode reuse (the consumer
             side of level-10 reuse lands with the analysis-driven
             decide pass next round).

Storage is one .npz per stream with flat arrays indexed by display
order — the Python-native equivalent of the reference's binary
analysis file.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np


@dataclass
class FrameAnalysisRecord:
    display: int
    slice_type: str = ""
    is_scenecut: bool = False
    gop_close: bool = False                   # b-adapt early GOP close
    qp_offsets: np.ndarray | None = None      # [hc, wc] float32
    # level-10 CU data (filled when available)
    kinds: np.ndarray | None = None           # [hc, wc]
    inter_dir: np.ndarray | None = None
    mv0: np.ndarray | None = None             # [hc, wc, 2] qpel
    mv1: np.ndarray | None = None
    modes: np.ndarray | None = None           # intra modes
    split: np.ndarray | None = None           # [hc32, wc32] CU32 split


class AnalysisWriter:
    def __init__(self, path: str, level: int = 10):
        self.path = path
        self.level = level
        self._frames: dict[int, FrameAnalysisRecord] = {}

    def add(self, rec: FrameAnalysisRecord) -> None:
        self._frames[rec.display] = rec

    def close(self) -> None:
        n = max(self._frames) + 1 if self._frames else 0
        payload: dict[str, np.ndarray] = {
            "level": np.int32(self.level),
            "n_frames": np.int32(n),
        }
        types = np.zeros(n, dtype="U1")
        cuts = np.zeros(n, dtype=bool)
        closes = np.zeros(n, dtype=bool)
        for d, rec in self._frames.items():
            types[d] = rec.slice_type or "?"
            cuts[d] = rec.is_scenecut
            closes[d] = rec.gop_close
            if rec.qp_offsets is not None:
                payload[f"qpoff_{d}"] = np.asarray(rec.qp_offsets,
                                                   np.float32)
            if self.level >= 10:
                if rec.kinds is not None:
                    payload[f"kinds_{d}"] = np.asarray(rec.kinds,
                                                       np.int8)
                if rec.inter_dir is not None:
                    payload[f"dir_{d}"] = np.asarray(rec.inter_dir,
                                                     np.int8)
                if rec.mv0 is not None:
                    payload[f"mv0_{d}"] = np.asarray(rec.mv0, np.int16)
                if rec.mv1 is not None:
                    payload[f"mv1_{d}"] = np.asarray(rec.mv1, np.int16)
                if rec.modes is not None:
                    payload[f"modes_{d}"] = np.asarray(rec.modes,
                                                       np.int8)
                if rec.split is not None:
                    payload[f"split_{d}"] = np.asarray(rec.split,
                                                       np.int8)
        payload["slice_types"] = types
        payload["scenecuts"] = cuts
        payload["gop_closes"] = closes
        np.savez_compressed(self.path, **payload)


class AnalysisReader:
    def __init__(self, path: str):
        if not os.path.exists(path):
            raise FileNotFoundError(f"analysis file missing: {path}")
        self._z = np.load(path, allow_pickle=False)
        self.level = int(self._z["level"])
        self.n_frames = int(self._z["n_frames"])

    def frame(self, display: int) -> FrameAnalysisRecord:
        z = self._z
        rec = FrameAnalysisRecord(display=display)
        if display < len(z["slice_types"]):
            rec.slice_type = str(z["slice_types"][display])
            rec.is_scenecut = bool(z["scenecuts"][display])
            if "gop_closes" in z:
                rec.gop_close = bool(z["gop_closes"][display])
        key = f"qpoff_{display}"
        if key in z:
            rec.qp_offsets = z[key]
        for name in ("kinds", "dir", "mv0", "mv1", "modes",
                     "split"):
            k = f"{name}_{display}"
            if k in z:
                setattr(rec, "inter_dir" if name == "dir" else name,
                        z[k])
        return rec
