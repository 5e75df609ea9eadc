"""Unit tests for the pure-Python raw snappy block format
(formats/snappy_py.py; public spec google/snappy format_description.txt)."""

import random

import pytest

from kafka_connect_oss_spark.formats import snappy_py


@pytest.mark.parametrize("data", [
    b"",
    b"a",
    b"abc",
    b"abcd",                                  # exactly MIN_MATCH
    b"the quick brown fox " * 3,
    b"\x00" * 1000,                           # RLE-ish: overlapping copies
    b"ab" * 5000,
    bytes(range(256)) * 10,                   # no matches beyond table hits
])
def test_roundtrip_small(data):
    comp = snappy_py.compress(data)
    assert snappy_py.decompress(comp) == data


def test_roundtrip_random_and_fragment_boundary():
    rnd = random.Random(7)
    # spans multiple 64 KiB fragments; mixes compressible + random spans
    parts = []
    for _ in range(40):
        if rnd.random() < 0.5:
            parts.append(bytes(rnd.getrandbits(8) for _ in range(rnd.randint(1, 4000))))
        else:
            parts.append(rnd.choice([b"lorem ipsum ", b"spark", b"\x00\x01"])
                         * rnd.randint(1, 2000))
    data = b"".join(parts) * 2
    assert len(data) > 3 * 65536
    comp = snappy_py.compress(data)
    assert snappy_py.decompress(comp) == data
    # repetitive content must actually compress (~3 bytes per 64-byte
    # max-length copy, the same ratio the reference C++ encoder gets on RLE)
    rep = b"x" * 100000
    assert len(snappy_py.compress(rep)) < len(rep) // 20


@pytest.mark.parametrize("n", [64, 65, 66, 67, 68, 69, 131, 4097])
def test_long_match_split_boundaries(n):
    # a literal head then a match of exactly n bytes — exercises the
    # 64/65-67 copy-splitting edge (65 must not emit an unencodable
    # 1-byte copy)
    data = b"HEADERXYZ" + b"Q" * n + b"TAIL"
    assert snappy_py.decompress(snappy_py.compress(data)) == data


def test_decodes_one_and_four_byte_offset_copies():
    # our encoder only emits 2-byte-offset copies; the decoder must accept
    # the full format. Hand-craft: literal "abcd", copy-1 (len 4, off 4),
    # then copy-4 (len 4, off 4).
    stream = bytearray()
    stream.append(12)                         # varint 12 = output length
    stream += bytes([3 << 2]) + b"abcd"       # literal len 4
    stream.append(((4 - 4) << 2) | (0 << 5) | 0b01)   # copy-1: len 4
    stream.append(4)                          # offset low byte = 4
    stream.append(((4 - 1) << 2) | 0b11)      # copy-4: len 4
    stream += (4).to_bytes(4, "little")
    assert snappy_py.decompress(bytes(stream)) == b"abcdabcdabcd"


@pytest.mark.parametrize("bad", [
    b"",                                       # no preamble
    b"\x05" + bytes([3 << 2]) + b"ab",         # truncated literal body
    b"\x04" + bytes([0b10 | (3 << 2)]) + b"\x01",   # truncated copy offset
    b"\x08" + bytes([(3 << 2)]) + b"abcd"
    + bytes([0b10 | (3 << 2)]) + b"\x10\x00",  # copy offset 16 > written 4
    b"\x09" + bytes([3 << 2]) + b"abcd"
    + bytes([0b10 | (3 << 2)]) + b"\x04\x00",  # length mismatch vs preamble
])
def test_corrupt_streams_rejected(bad):
    with pytest.raises(ValueError):
        snappy_py.decompress(bad)


def test_interop_with_pyarrow_snappy():
    # cross-validate against an independent implementation when the
    # installed pyarrow was built with the snappy codec
    pa = pytest.importorskip("pyarrow")
    rnd = random.Random(11)
    for data in [b"", b"abc", b"spark " * 4000,
                 bytes(rnd.getrandbits(8) for _ in range(70000))]:
        try:
            theirs = pa.compress(data, codec="snappy", asbytes=True)
        except (pa.lib.ArrowNotImplementedError, OSError):
            pytest.skip("pyarrow built without snappy")
        assert snappy_py.decompress(theirs) == data
        back = pa.decompress(snappy_py.compress(data),
                             decompressed_size=len(data),
                             codec="snappy", asbytes=True)
        assert back == data


def test_compress_is_deterministic():
    data = (b"deterministic " * 999) + bytes(range(256))
    assert snappy_py.compress(data) == snappy_py.compress(data)
