"""Codec round-trip properties (SURVEY.md §5.3): decode(encode(x)) == x for
random int32 arrays including adversarial bit patterns.  hypothesis is not
guaranteed usable offline -> hand-rolled seeded loops."""

import numpy as np

from anomalydetection_ray.codecs import (
    BitReader,
    DodState,
    checksum64,
    dod_decode_stream,
    dod_encode_chunk,
    dod_encode_values,
    gorilla_decode,
    gorilla_decode_ref,
    gorilla_encode,
    pack_bits,
    state_hash,
)


def test_pack_bits_known():
    # 0b101 (3 bits) + 0b1 (1 bit) + 0xAB (8 bits) = 1011 1010 1011 -> 0xBA 0xB0
    out = pack_bits(np.array([0b101, 0b1, 0xAB], dtype=np.uint64), np.array([3, 1, 8], dtype=np.uint8))
    assert out == bytes([0xBA, 0xB0])
    r = BitReader(out)
    assert r.read(3) == 0b101 and r.read(1) == 1 and r.read(8) == 0xAB


def test_pack_bits_word_spanning():
    # 45-bit values crossing 64-bit word boundaries repeatedly
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 2**45, 500, dtype=np.uint64)
    nbits = np.full(500, 45, dtype=np.uint8)
    out = pack_bits(vals, nbits)
    r = BitReader(out)
    for v in vals.tolist():
        assert r.read(45) == v


def test_gorilla_roundtrip_random():
    rng = np.random.default_rng(42)
    for trial in range(50):
        n = int(rng.integers(0, 3000))
        kind = trial % 5
        if kind == 0:
            v = rng.integers(0, 50257, n).astype(np.int32)
        elif kind == 1:
            v = rng.integers(-(2**31), 2**31 - 1, n).astype(np.int32)
        elif kind == 2:
            v = np.full(n, int(rng.integers(-(2**31), 2**31 - 1)), dtype=np.int32)
        elif kind == 3:
            v = (np.cumsum(rng.integers(-5, 6, n)) % 50257).astype(np.int32)
        else:  # adversarial bit patterns
            v = rng.choice(
                np.array([0, 1, -1, 2**31 - 1, -(2**31), 0x55555555 - 2**31, 0x0F0F0F0F], dtype=np.int32), n
            )
        enc = gorilla_encode(v)
        if n:
            dec = gorilla_decode(int(v[0]), enc, n)
            assert np.array_equal(dec, v), f"trial {trial}"
            # the generic control-bit follower must agree with the fast
            # vectorized decoder on every stream (same grammar)
            ref = gorilla_decode_ref(int(v[0]), enc, n)
            assert np.array_equal(ref, v), f"trial {trial} (ref)"
        else:
            assert enc == b""


def test_gorilla_chunk_boundaries():
    # n-1 exactly at / around multiples of GORILLA_CHUNK, incl. n=2
    rng = np.random.default_rng(11)
    for m in [1, 2, 31, 32, 33, 63, 64, 65, 1023, 1024, 1025]:
        v = rng.integers(-(2**31), 2**31 - 1, m + 1).astype(np.int32)
        enc = gorilla_encode(v)
        assert np.array_equal(gorilla_decode(int(v[0]), enc, m + 1), v), m
        assert np.array_equal(gorilla_decode_ref(int(v[0]), enc, m + 1), v), m


def test_dod_encode_values_matches_scalar():
    rng = np.random.default_rng(44)
    for _ in range(10):
        n = int(rng.integers(1, 300))
        vals = rng.integers(-(2**31), 2**31 - 1, n).tolist()
        s1, s2 = DodState(), DodState()
        scalar = [dod_encode_chunk(s1, v) for v in vals]
        batched = dod_encode_values(s2, vals)
        assert scalar == batched
        assert s1.as_tuple() == s2.as_tuple()
        # split the batch arbitrarily: state must carry across calls
        s3 = DodState()
        k = n // 2
        split = dod_encode_values(s3, vals[:k]) + dod_encode_values(s3, vals[k:])
        assert split == scalar and s3.as_tuple() == s1.as_tuple()


def test_dod_roundtrip():
    rng = np.random.default_rng(43)
    for _ in range(20):
        n = int(rng.integers(1, 400))
        vals = rng.integers(-(2**31), 2**31 - 1, n).tolist()
        st = DodState()
        chunks = [dod_encode_chunk(st, v) for v in vals]
        assert dod_decode_stream(chunks).tolist() == vals
        assert st.count == n


def test_dod_compression_on_similar_lengths():
    # realistic n_tok streams (nearby values) should cost ~1-2 bytes/value
    vals = (1000 + np.arange(500) * 3).tolist()
    st = DodState()
    chunks = [dod_encode_chunk(st, v) for v in vals]
    assert sum(map(len, chunks)) <= 2 * len(vals) + 4


def test_state_hash_deterministic():
    s1, s2 = DodState(), DodState()
    for v in (5, 9, 9, 100):
        dod_encode_chunk(s1, v)
        dod_encode_chunk(s2, v)
    assert state_hash(s1) == state_hash(s2)
    dod_encode_chunk(s2, 101)
    assert state_hash(s1) != state_hash(s2)


def test_checksum64():
    assert checksum64(b"") == checksum64(b"")
    assert checksum64(b"abc") != checksum64(b"abd")
    assert checksum64(b"abc") < 2**64
