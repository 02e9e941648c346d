"""Gorilla-style compression codecs (SURVEY.md §2.2 E1/E2/E3).

Adapted from Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time
Series Database", VLDB 2015:

- **E1 value codec** (§4.1.2 of the paper, adapted float64 -> uint32 bit
  patterns): XOR each int32 token value with its predecessor;
  control '0'  -> XOR == 0 (1 bit total);
  control '10' -> meaningful bits fit the previous leading/trailing-zero
                  window (2 + prev_len bits);
  control '11' -> new window header: 5-bit leading-zero count + 6-bit
                  meaningful length (1..32) + the meaningful bits.
  The first value of a block is NOT in the stream (stored in the
  ``first_val`` column of tier0).

- **E2 timestamp codec** (§4.1.1): delta-of-delta with bit classes
  '0' (D == 0), '10' + 7 bits (D in [-63, 64]), '110' + 9 bits
  ([-255, 256]), '1110' + 12 bits ([-2047, 2048]), '1111' + 32 bits.
  Used for the per-partition ``n_tok`` stream; each row's contribution is
  one byte-aligned chunk so rows stay independently writable while the
  concatenated chunks in row order form one logical stream (the encoder
  actor carries the (prev, prev_delta) state across rows — SURVEY.md §3 P2).

Bit order is MSB-first within bytes.  Encoding uses a NumPy-vectorized
variable-width bit packer (the only Python-level loop is the per-element
control decision, which carries the sequential window state).  Both the
oracle and the Ray engine call these exact functions, so round-trip and
bit-for-bit checks are meaningful.
"""

from __future__ import annotations

import zlib

import numpy as np

__all__ = [
    "pack_bits",
    "BitReader",
    "gorilla_encode",
    "gorilla_decode",
    "dod_encode_chunk",
    "dod_decode_stream",
    "DodState",
    "checksum64",
    "state_hash",
]

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def pack_bits(vals: np.ndarray, nbits: np.ndarray) -> bytes:
    """Pack ``vals[i]`` (low ``nbits[i]`` bits, MSB-first stream order) into
    bytes.  Vectorized: each element touches at most two 64-bit words."""
    if vals.shape[0] == 0:
        return b""
    nb = nbits.astype(np.int64)
    ends = np.cumsum(nb)
    starts = ends - nb
    total = int(ends[-1])
    nwords = (total + 63) // 64 + 1
    words = np.zeros(nwords, dtype=np.uint64)

    v = vals.astype(np.uint64)
    word_idx = (starts >> 6).astype(np.int64)
    off = (starts & 63).astype(np.int64)
    sh = 64 - off - nb  # right-align within the word; negative => spans two
    pos = sh >= 0
    sh_pos = np.where(pos, sh, 0).astype(np.uint64)
    sh_neg = np.where(pos, 0, -sh).astype(np.uint64)
    hi = np.where(pos, (v << sh_pos) & _MASK64, v >> sh_neg)
    lo = np.where(pos, np.uint64(0), (v << ((np.uint64(64) - sh_neg) & np.uint64(63))) & _MASK64)
    # when sh_neg == 0 the expression above would be v<<64; pos covers that case
    np.bitwise_or.at(words, word_idx, hi)
    np.bitwise_or.at(words, word_idx + 1, lo)
    return words.byteswap().tobytes()[: (total + 7) // 8]


class BitReader:
    """MSB-first bit reader over bytes (decode path — verify/restore only)."""

    __slots__ = ("data", "pos", "acc", "nacc")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # next byte index
        self.acc = 0
        self.nacc = 0

    def read(self, n: int) -> int:
        while self.nacc < n:
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nacc += 8
        self.nacc -= n
        out = (self.acc >> self.nacc) & ((1 << n) - 1)
        self.acc &= (1 << self.nacc) - 1
        return out


def _clz_tz(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized count-leading/trailing-zeros for nonzero uint32 arrays.
    float64 log2 is exact for 32-bit magnitudes (52-bit mantissa)."""
    xf = x.astype(np.float64)
    bl = np.floor(np.log2(xf)).astype(np.int64) + 1
    lz = 32 - bl
    low = (x & (~x + np.uint32(1))).astype(np.float64)  # x & -x
    tz = np.log2(low).astype(np.int64)
    return lz, tz


def gorilla_encode(values: np.ndarray) -> bytes:
    """E1: encode ``values[1:]`` (int32) against their predecessors.
    ``values[0]`` is carried out-of-band (tier0 ``first_val``)."""
    v = np.ascontiguousarray(values, dtype=np.int32).view(np.uint32)
    n = v.shape[0]
    if n <= 1:
        return b""
    xor = v[1:] ^ v[:-1]
    nz = xor != 0
    lz_a = np.zeros(n - 1, dtype=np.int64)
    tz_a = np.zeros(n - 1, dtype=np.int64)
    if nz.any():
        lz_a[nz], tz_a[nz] = _clz_tz(xor[nz])
    # The control decision carries sequential window state -> Python loop,
    # but over plain ints (numpy scalar ops are ~10x slower in a tight loop).
    xor_l = xor.tolist()
    lz_l = lz_a.tolist()
    tz_l = tz_a.tolist()
    out_v = [0] * (n - 1)
    out_b = [0] * (n - 1)
    prev_lz = -1  # invalid window
    prev_tz = -1
    prev_len = 0
    for i in range(n - 1):
        x = xor_l[i]
        if x == 0:
            out_b[i] = 1  # control '0', value 0
            continue
        lz = lz_l[i]
        tz = tz_l[i]
        if lz >= prev_lz >= 0 and tz >= prev_tz:
            # control '10' + meaningful bits inside the previous window
            out_v[i] = (0b10 << prev_len) | (x >> prev_tz)
            out_b[i] = 2 + prev_len
        else:
            length = 32 - lz - tz
            hdr = (0b11 << 11) | (lz << 6) | length
            out_v[i] = (hdr << length) | (x >> tz)
            out_b[i] = 13 + length
            prev_lz, prev_tz, prev_len = lz, tz, length
    return pack_bits(np.array(out_v, dtype=np.uint64), np.array(out_b, dtype=np.uint8))


def gorilla_decode(first_val: int, data: bytes, n: int) -> np.ndarray:
    """E3: inverse of ``gorilla_encode``; returns int32[n]."""
    out = np.empty(n, dtype=np.uint32)
    if n == 0:
        return out.view(np.int32)
    prev = np.uint32(first_val & 0xFFFFFFFF)
    out[0] = prev
    r = BitReader(data)
    prev_lz = prev_tz = prev_len = 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:  # '10'
            mbits = r.read(prev_len)
            xor = mbits << prev_tz
        else:  # '11'
            prev_lz = r.read(5)
            prev_len = r.read(6)
            prev_tz = 32 - prev_lz - prev_len
            xor = r.read(prev_len) << prev_tz
        prev = prev ^ np.uint32(xor)
        out[i] = prev
    return out.view(np.int32)


class DodState:
    """Per-partition delta-of-delta stream state held by the encoder actor."""

    __slots__ = ("prev", "prev_delta", "count")

    def __init__(self, prev: int = 0, prev_delta: int = 0, count: int = 0):
        self.prev = prev
        self.prev_delta = prev_delta
        self.count = count

    def as_tuple(self) -> tuple[int, int, int]:
        return (self.prev, self.prev_delta, self.count)


def _wrap32(x: int) -> int:
    """Wrap to signed 32-bit (mod 2^32 arithmetic is a group, so encode and
    decode that both wrap reconstruct values exactly even when a raw delta
    exceeds the int32 range)."""
    return ((x + 0x80000000) & 0xFFFFFFFF) - 0x80000000


def dod_encode_chunk(state: DodState, value: int) -> bytes:
    """E2: append one value to the stream; returns its byte-aligned chunk and
    mutates ``state``.  The first value of a stream is stored raw (32 bits)."""
    if state.count == 0:
        vals = np.array([value & 0xFFFFFFFF], dtype=np.uint64)
        bits = np.array([32], dtype=np.uint8)
        state.prev = value
        state.prev_delta = 0
        state.count = 1
        return pack_bits(vals, bits)
    delta = _wrap32(value - state.prev)
    d = _wrap32(delta - state.prev_delta)
    if d == 0:
        v, nb = 0b0, 1
    elif -63 <= d <= 64:
        v, nb = (0b10 << 7) | (d + 63), 9
    elif -255 <= d <= 256:
        v, nb = (0b110 << 9) | (d + 255), 12
    elif -2047 <= d <= 2048:
        v, nb = (0b1110 << 12) | (d + 2047), 16
    else:
        v, nb = (0b1111 << 32) | (d & 0xFFFFFFFF), 36
    state.prev = value
    state.prev_delta = delta
    state.count += 1
    return pack_bits(np.array([v], dtype=np.uint64), np.array([nb], dtype=np.uint8))


def dod_decode_stream(chunks: list[bytes]) -> np.ndarray:
    """E3: decode one value per byte-aligned chunk, in stream order."""
    out = np.empty(len(chunks), dtype=np.int64)
    prev = prev_delta = 0
    for i, chunk in enumerate(chunks):
        r = BitReader(chunk)
        if i == 0:
            v = r.read(32)
            prev = v - (1 << 32) if v >= (1 << 31) else v
        else:
            if r.read(1) == 0:
                d = 0
            elif r.read(1) == 0:
                d = r.read(7) - 63
            elif r.read(1) == 0:
                d = r.read(9) - 255
            elif r.read(1) == 0:
                d = r.read(12) - 2047
            else:
                v = r.read(32)
                d = v - (1 << 32) if v >= (1 << 31) else v
            delta = _wrap32(prev_delta + d)
            prev = _wrap32(prev + delta)
            prev_delta = delta
        out[i] = prev
    return out


def checksum64(data: bytes) -> int:
    """Deterministic 64-bit checksum built from two salted CRC32s (zlib is
    C-speed; a pure-Python FNV loop would dominate encode time)."""
    return (zlib.crc32(data, 0) << 32) | zlib.crc32(data, 0x9E3779B9 & 0xFFFFFFFF)


def state_hash(state: DodState) -> str:
    """Stable hex hash of the encoder stream state, recorded in the manifest
    (BASELINE.json:6 'encoder state hash')."""
    raw = np.array(state.as_tuple(), dtype=np.int64).tobytes()
    return f"{checksum64(raw):016x}"
