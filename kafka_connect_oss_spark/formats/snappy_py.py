"""Pure-Python Snappy raw block format (public spec:
google/snappy format_description.txt).

Implements compress/decompress of the RAW snappy format — the form the
Avro container spec's ``snappy`` codec uses (each Avro block additionally
carries a big-endian CRC32 of the uncompressed bytes; that suffix lives
in formats/avro_py.py, not here). This is NOT the framing format
(framing_format.txt) used by streaming tools.

Wire layout:

* preamble: uncompressed length as a little-endian base-128 varint;
* elements, each starting with a tag byte whose low 2 bits select:
    00 literal   — length-1 in tag bits 2-7 (0..59), or 60/61/62/63
                   meaning the next 1/2/3/4 little-endian bytes hold
                   length-1;
    01 copy      — 11-bit offset: length-4 in tag bits 2-4 (len 4..11),
                   offset = tag bits 5-7 << 8 | next byte;
    10 copy      — 2-byte little-endian offset, length-1 in tag bits 2-7;
    11 copy      — 4-byte little-endian offset, length-1 in tag bits 2-7.

The compressor is the classic greedy hash-table matcher over 64 KiB
fragments (matches never cross a fragment boundary, so 2-byte offsets
always suffice — the reference C++ encoder makes the same choice). Any
spec-conforming element stream is valid snappy; the decompressor accepts
the full format including 1- and 4-byte-offset copies and overlapping
copies (offset < length), which RLE-style encoders emit.

Speed: this is Python, so ~MB/s, not GB/s — it exists so the Avro codec
matrix matches the reference's tested set (TestDataWriterAvro.java:154-167)
in an environment with no snappy library. Swap in python-snappy/cramjam
transparently if the environment ever grows one.
"""

from __future__ import annotations

_FRAGMENT = 65536           # encoder block size; matches reference encoder
_MIN_MATCH = 4
_MAX_COPY_LEN = 64


def _write_varint(out: bytearray, n: int) -> None:
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("snappy: truncated varint preamble")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: varint overflow")


def _emit_literal(out: bytearray, chunk: bytes) -> None:
    n = len(chunk) - 1
    if n < 60:
        out.append(n << 2)
    elif n < (1 << 8):
        out.append(60 << 2)
        out.append(n)
    elif n < (1 << 16):
        out.append(61 << 2)
        out += n.to_bytes(2, "little")
    elif n < (1 << 24):
        out.append(62 << 2)
        out += n.to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += n.to_bytes(4, "little")
    out += chunk


def _emit_copies(out: bytearray, offset: int, length: int) -> None:
    # 2-byte-offset copies cover every match the fragment scheme produces
    # (offset < 65536); long matches split into <=64-byte copies, always
    # leaving >= MIN_MATCH for the final one (a 65-byte match must not
    # become 64+1 — 1 is not encodable as a copy)
    while length > _MAX_COPY_LEN + _MIN_MATCH - 1:
        out.append((_MAX_COPY_LEN - 1) << 2 | 0b10)
        out += offset.to_bytes(2, "little")
        length -= _MAX_COPY_LEN
    if length > _MAX_COPY_LEN:                       # 65..67 left
        out.append((length - _MIN_MATCH - 1) << 2 | 0b10)
        out += offset.to_bytes(2, "little")
        length = _MIN_MATCH
    out.append((length - 1) << 2 | 0b10)
    out += offset.to_bytes(2, "little")


def _compress_fragment(src: bytes, out: bytearray) -> None:
    n = len(src)
    if n < _MIN_MATCH:
        _emit_literal(out, src)
        return
    table: dict[bytes, int] = {}
    i = 0
    literal_start = 0
    limit = n - _MIN_MATCH + 1
    while i < limit:
        key = src[i:i + _MIN_MATCH]
        cand = table.get(key)
        table[key] = i
        # the dict keys on the 4 bytes themselves, so a hit is always a
        # true match
        if cand is not None:
            # extend the match forward
            m = i + _MIN_MATCH
            c = cand + _MIN_MATCH
            while m < n and src[m] == src[c]:
                m += 1
                c += 1
            if literal_start < i:
                _emit_literal(out, src[literal_start:i])
            _emit_copies(out, i - cand, m - i)
            i = m
            literal_start = m
        else:
            i += 1
    if literal_start < n:
        _emit_literal(out, src[literal_start:])


def compress(data: bytes) -> bytes:
    """Raw-snappy compress (spec-conforming; greedy matcher)."""
    out = bytearray()
    _write_varint(out, len(data))       # empty input: preamble 0, no elements
    for frag_start in range(0, len(data), _FRAGMENT):
        _compress_fragment(data[frag_start:frag_start + _FRAGMENT], out)
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Raw-snappy decompress with full-format support and bounds checks."""
    expected, pos = _read_varint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 0b11
        if kind == 0b00:                               # literal
            ln = tag >> 2
            if ln >= 60:
                extra = ln - 59
                if pos + extra > n:
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(data[pos:pos + extra], "little")
                pos += extra
            ln += 1
            if pos + ln > n:
                raise ValueError("snappy: truncated literal body")
            out += data[pos:pos + ln]
            pos += ln
            continue
        if kind == 0b01:                               # copy, 11-bit offset
            ln = ((tag >> 2) & 0x7) + 4
            if pos >= n:
                raise ValueError("snappy: truncated copy-1 offset")
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 0b10:                             # copy, 2-byte offset
            ln = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy-2 offset")
            offset = int.from_bytes(data[pos:pos + 2], "little")
            pos += 2
        else:                                          # copy, 4-byte offset
            ln = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy-4 offset")
            offset = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy: copy offset out of range")
        # overlapping copies (offset < length) replicate byte-by-byte —
        # the spec's RLE mechanism
        if offset >= ln:
            start = len(out) - offset
            out += out[start:start + ln]
        else:
            start = len(out) - offset
            for k in range(ln):
                out.append(out[start + k])
    if len(out) != expected:
        raise ValueError(
            f"snappy: length mismatch (preamble {expected}, got {len(out)})")
    return bytes(out)
