"""ReconPlay: pipe reconstructed frames to an external player
(role of reference `output/reconplay.{h,cpp}`: popen of the
--recon-y4m-exec command with a Y4M stream on its stdin,
reconplay.cpp:33-40).

The player command is launched once; frames are written in display
order as Y4M (header + per-frame FRAME markers).  A dead player (e.g.
the user closed the window) stops the feed without failing the encode
— the reference ignores SIGPIPE the same way.
"""

from __future__ import annotations

import subprocess

import numpy as np


class ReconPlay:
    def __init__(self, command: str, width: int, height: int,
                 fps_num: int, fps_den: int):
        self.width, self.height = width, height
        self._proc = subprocess.Popen(
            command, shell=True, stdin=subprocess.PIPE,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        self._alive = True
        self._write(
            f"YUV4MPEG2 W{width} H{height} "
            f"F{fps_num}:{max(fps_den, 1)} Ip A1:1 C420\n".encode())

    def _write(self, data: bytes) -> None:
        if not self._alive:
            return
        try:
            self._proc.stdin.write(data)
        except (BrokenPipeError, OSError):
            self._alive = False

    def write_frame(self, y: np.ndarray, cb: np.ndarray,
                    cr: np.ndarray) -> None:
        self._write(b"FRAME\n")
        for pl in (y, cb, cr):
            self._write(np.ascontiguousarray(pl, dtype=np.uint8)
                        .tobytes())

    def close(self) -> None:
        if self._alive:
            try:
                self._proc.stdin.close()
            except OSError:
                pass
        self._proc.wait(timeout=10)
