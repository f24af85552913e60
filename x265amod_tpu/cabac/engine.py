"""CABAC binary arithmetic coding engine (pure-Python reference).

Encoder follows the informative encoding process of ITU-T H.265 9.3.4
(PutBit / bitsOutstanding formulation); decoder follows the normative
arithmetic decoding process of 9.3.2/9.3.4.3.  They are deliberately
*different* algorithm formulations so that the encode->decode roundtrip is
a meaningful conformance check (analog of the reference's golden-bitstream
strategy, `test/regression-tests.txt:3-7`).

The production hot path uses the native C++ coder in
`x265amod_tpu/native/cabac.cpp`; this module is the oracle and fallback.
Role of reference `encoder/entropy.cpp:2457-2583` (encodeBin/encodeBinEP/
writeOut) — reimplemented from the spec, not ported.
"""

from __future__ import annotations

import numpy as np

from .tables import (RANGE_TAB_LPS, TRANS_IDX_LPS, TRANS_IDX_MPS,
                     init_context_states)


class CabacEncoder:
    """Binary arithmetic encoder (spec 9.3.4, informative formulation)."""

    def __init__(self) -> None:
        self.low = 0
        self.range = 510
        self.bits_outstanding = 0
        self.first_bit = True
        self._bitbuf = 0
        self._bitcnt = 0
        self._bytes = bytearray()
        self.ctx: np.ndarray | None = None
        self.bin_count = 0

    def init_contexts(self, slice_type: str, qp: int) -> None:
        self.ctx = init_context_states(slice_type, qp)

    def load_contexts(self, states: np.ndarray) -> None:
        self.ctx = states.copy()

    def save_contexts(self) -> np.ndarray:
        assert self.ctx is not None
        return self.ctx.copy()

    # -- raw bit output ----------------------------------------------------
    def _write_bit(self, b: int) -> None:
        self._bitbuf = (self._bitbuf << 1) | b
        self._bitcnt += 1
        if self._bitcnt == 8:
            self._bytes.append(self._bitbuf)
            self._bitbuf = 0
            self._bitcnt = 0

    def _put_bit(self, b: int) -> None:
        if self.first_bit:
            self.first_bit = False
        else:
            self._write_bit(b)
        while self.bits_outstanding > 0:
            self._write_bit(1 - b)
            self.bits_outstanding -= 1

    def _renorm(self) -> None:
        while self.range < 256:
            if self.low < 256:
                self._put_bit(0)
            elif self.low >= 512:
                self.low -= 512
                self._put_bit(1)
            else:
                self.low -= 256
                self.bits_outstanding += 1
            self.range <<= 1
            self.low <<= 1

    # -- bin coding --------------------------------------------------------
    def encode_bin(self, ctx_idx: int, bin_val: int) -> None:
        state, mps = self.ctx[ctx_idx]
        lps = RANGE_TAB_LPS[state, (self.range >> 6) & 3]
        self.range -= lps
        if bin_val != mps:
            self.low += self.range
            self.range = int(lps)
            if state == 0:
                self.ctx[ctx_idx, 1] = 1 - mps
            self.ctx[ctx_idx, 0] = TRANS_IDX_LPS[state]
        else:
            self.ctx[ctx_idx, 0] = TRANS_IDX_MPS[state]
        self._renorm()
        self.bin_count += 1

    def encode_bypass(self, bin_val: int) -> None:
        self.low <<= 1
        if bin_val:
            self.low += self.range
        if self.low >= 1024:
            self._put_bit(1)
            self.low -= 1024
        elif self.low < 512:
            self._put_bit(0)
        else:
            self.low -= 512
            self.bits_outstanding += 1
        self.bin_count += 1

    def encode_bypass_bins(self, value: int, n: int) -> None:
        for shift in range(n - 1, -1, -1):
            self.encode_bypass((value >> shift) & 1)

    def encode_terminate(self, bin_val: int) -> None:
        self.range -= 2
        if bin_val:
            self.low += self.range
            self._flush()
        else:
            self._renorm()
        self.bin_count += 1

    def _flush(self) -> None:
        self.range = 2
        self._renorm()
        self._put_bit((self.low >> 9) & 1)
        # write 2 bits: ((low >> 7) & 3) | 1
        v = ((self.low >> 7) & 3) | 1
        self._write_bit((v >> 1) & 1)
        self._write_bit(v & 1)

    def finish(self) -> bytes:
        """Byte-align with zero bits and return the byte stream.

        Caller must have encoded a terminate bin with value 1 (which runs
        the flush) before calling; alignment bits here are the
        rbsp_slice_segment_trailing stop-one + zeros handled by caller.
        """
        while self._bitcnt != 0:
            self._write_bit(0)
        return bytes(self._bytes)

    def pending_bits(self) -> int:
        return len(self._bytes) * 8 + self._bitcnt


class CabacDecoder:
    """Normative arithmetic decoding process (spec 9.3.2, 9.3.4.3)."""

    def __init__(self, data: bytes, slice_type: str, qp: int,
                 states=None) -> None:
        self._data = data
        self._bitpos = 0
        self.range = 510
        self.offset = self._read_bits(9)
        # states: WPP context inheritance (spec 9.3.1 sync from the
        # above-right CTB's stored snapshot) instead of fresh init
        self.ctx = states.copy() if states is not None \
            else init_context_states(slice_type, qp)

    def save_contexts(self):
        return self.ctx.copy()

    def _read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte_idx = self._bitpos >> 3
            byte = self._data[byte_idx] if byte_idx < len(self._data) else 0
            v = (v << 1) | ((byte >> (7 - (self._bitpos & 7))) & 1)
            self._bitpos += 1
        return v

    def decode_bin(self, ctx_idx: int) -> int:
        state, mps = self.ctx[ctx_idx]
        lps = int(RANGE_TAB_LPS[state, (self.range >> 6) & 3])
        self.range -= lps
        if self.offset >= self.range:
            bin_val = 1 - mps
            self.offset -= self.range
            self.range = lps
            if state == 0:
                self.ctx[ctx_idx, 1] = 1 - mps
            self.ctx[ctx_idx, 0] = TRANS_IDX_LPS[state]
        else:
            bin_val = int(mps)
            self.ctx[ctx_idx, 0] = TRANS_IDX_MPS[state]
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._read_bits(1)
        return bin_val

    def decode_bypass(self) -> int:
        self.offset = (self.offset << 1) | self._read_bits(1)
        if self.offset >= self.range:
            self.offset -= self.range
            return 1
        return 0

    def decode_bypass_bins(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.decode_bypass()
        return v

    def decode_terminate(self) -> int:
        self.range -= 2
        if self.offset >= self.range:
            return 1
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._read_bits(1)
        return 0

    @property
    def consumed_bytes(self) -> int:
        return (self._bitpos + 7) >> 3
