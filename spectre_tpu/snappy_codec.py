"""Snappy framing + block format codec (no external deps).

The consensus-spec-tests fixtures are `.ssz_snappy` — SSZ bytes wrapped in
the snappy *framing* format (stream identifier chunk, then compressed /
uncompressed data chunks with masked CRC32C). The reference reads them via
the `snap` crate (test-utils/src/lib.rs load_snappy_ssz); this is the
from-scratch equivalent.

Decoder handles both chunk types and full block-format back-references;
the encoder emits compressed chunks with a correct (if greedy) block
encoding — enough for the fixture generator to produce files any
conforming snappy reader accepts.
"""
from __future__ import annotations

_STREAM_ID = b"\xff\x06\x00\x00sNaPpY"

# ---------------------------------------------------------------- CRC32C

_CRC_TABLE = []


def _crc_table():
    if not _CRC_TABLE:
        poly = 0x82F63B78
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            _CRC_TABLE.append(c)
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    tab = _crc_table()
    c = 0xFFFFFFFF
    for b in data:
        c = tab[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ------------------------------------------------------------ block codec

def _read_varint(data: bytes, pos: int):
    out = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _write_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decompress_block(data: bytes) -> bytes:
    """Raw snappy block format -> bytes."""
    want, pos = _read_varint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:                      # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                ln = int.from_bytes(data[pos:pos + nb], "little")
                pos += nb
            ln += 1
            out += data[pos:pos + ln]
            pos += ln
        else:
            if kind == 1:                  # copy, 1-byte offset
                ln = ((tag >> 2) & 0x7) + 4
                off = ((tag >> 5) << 8) | data[pos]
                pos += 1
            elif kind == 2:                # copy, 2-byte offset
                ln = (tag >> 2) + 1
                off = int.from_bytes(data[pos:pos + 2], "little")
                pos += 2
            else:                          # copy, 4-byte offset
                ln = (tag >> 2) + 1
                off = int.from_bytes(data[pos:pos + 4], "little")
                pos += 4
            if off == 0 or off > len(out):
                raise ValueError("bad snappy copy offset")
            # overlapping copies are byte-at-a-time semantics
            start = len(out) - off
            for i in range(ln):
                out.append(out[start + i])
    if len(out) != want:
        raise ValueError(f"snappy length mismatch {len(out)} != {want}")
    return bytes(out)


def compress_block(data: bytes) -> bytes:
    """Greedy hash-match snappy block encoder (valid, not optimal)."""
    out = bytearray(_write_varint(len(data)))
    n = len(data)

    def emit_literal(lo: int, hi: int):
        ln = hi - lo - 1
        if ln < 60:
            out.append(ln << 2)
        else:
            nb = (ln.bit_length() + 7) // 8
            out.append((59 + nb) << 2)
            out.extend(ln.to_bytes(nb, "little"))
        out.extend(data[lo:hi])

    table: dict = {}
    pos = 0
    lit_start = 0
    while pos + 4 <= n:
        key = data[pos:pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is not None and pos - cand <= 0xFFFF:
            # extend the match
            ln = 4
            while pos + ln < n and ln < 64 and \
                    data[cand + ln] == data[pos + ln]:
                ln += 1
            if lit_start < pos:
                emit_literal(lit_start, pos)
            off = pos - cand
            out.append(((ln - 1) << 2) | 2)
            out += off.to_bytes(2, "little")
            pos += ln
            lit_start = pos
        else:
            pos += 1
    if lit_start < n:
        emit_literal(lit_start, n)
    return bytes(out)


# ------------------------------------------------------------ frame codec

def decompress_frame(data: bytes) -> bytes:
    """Snappy framing format -> bytes."""
    if not data.startswith(_STREAM_ID):
        raise ValueError("missing snappy stream identifier")
    pos = len(_STREAM_ID)
    out = bytearray()
    n = len(data)
    while pos < n:
        ctype = data[pos]
        ln = int.from_bytes(data[pos + 1:pos + 4], "little")
        body = data[pos + 4:pos + 4 + ln]
        pos += 4 + ln
        if ctype == 0x00:                  # compressed data
            crc = int.from_bytes(body[:4], "little")
            chunk = decompress_block(body[4:])
            if _masked_crc(chunk) != crc:
                raise ValueError("snappy chunk CRC mismatch")
            out += chunk
        elif ctype == 0x01:                # uncompressed data
            crc = int.from_bytes(body[:4], "little")
            chunk = body[4:]
            if _masked_crc(chunk) != crc:
                raise ValueError("snappy chunk CRC mismatch")
            out += chunk
        elif 0x80 <= ctype <= 0xFD:        # skippable
            continue
        else:
            raise ValueError(f"unknown snappy chunk type {ctype:#x}")
    return bytes(out)


def compress_frame(data: bytes) -> bytes:
    """bytes -> snappy framing format (compressed chunks, <=64 KiB each)."""
    out = bytearray(_STREAM_ID)
    for off in range(0, max(len(data), 1), 65536):
        chunk = data[off:off + 65536]
        body = _masked_crc(chunk).to_bytes(4, "little") + \
            compress_block(chunk)
        out.append(0x00)
        out += len(body).to_bytes(3, "little")
        out += body
    return bytes(out)
