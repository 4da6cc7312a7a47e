"""Generic SSZ type engine: serialize / deserialize / hash_tree_root.

The ssz_rs analog (SURVEY §2b): a declarative type system covering the
subset the consensus containers need — uints, booleans, byte vectors /
lists, bit vectors / lists, homogeneous vectors / lists, containers —
with spec-exact merkleization (chunk packing, zero-subtree padding to
the type's chunk limit, length mix-in for lists).

Used by `spectre_tpu.capella` (full Capella BeaconState / block body
schema) and the unit-test generator that re-derives the reference's
golden witnesses from its raw beacon-state snapshot
(reference: preprocessor/src/unit_test_gen.rs:21-210, which does the
same via the ethereum-consensus + ssz_rs crates).
"""
from __future__ import annotations

from types import SimpleNamespace
from typing import Any, List as TList, Sequence, Tuple

from .hashes.sha256 import sha256
from .ssz import merkleize_chunks, zero_hash

CHUNK = 32
OFFSET_SIZE = 4


def _pack_bytes(data: bytes) -> TList[bytes]:
    """Right-pad to a whole number of 32-byte chunks."""
    if not data:
        return []
    pad = (-len(data)) % CHUNK
    data = data + b"\x00" * pad
    return [data[i:i + CHUNK] for i in range(0, len(data), CHUNK)]


def _mix_in_length(root: bytes, length: int) -> bytes:
    return sha256(root + length.to_bytes(32, "little"))


class SSZType:
    fixed_size: int | None = None      # None => variable-size

    @property
    def is_fixed(self) -> bool:
        return self.fixed_size is not None

    def serialize(self, v) -> bytes:
        raise NotImplementedError

    def deserialize(self, b: bytes):
        raise NotImplementedError

    def hash_tree_root(self, v) -> bytes:
        raise NotImplementedError

    def default(self):
        raise NotImplementedError


class Uint(SSZType):
    def __init__(self, byte_len: int):
        self.fixed_size = byte_len

    def serialize(self, v) -> bytes:
        return int(v).to_bytes(self.fixed_size, "little")

    def deserialize(self, b: bytes) -> int:
        assert len(b) == self.fixed_size
        return int.from_bytes(b, "little")

    def hash_tree_root(self, v) -> bytes:
        return self.serialize(v) + b"\x00" * (CHUNK - self.fixed_size)

    def default(self) -> int:
        return 0


uint8 = Uint(1)
uint64 = Uint(8)
uint256 = Uint(32)


class Boolean(SSZType):
    fixed_size = 1

    def serialize(self, v) -> bytes:
        return b"\x01" if v else b"\x00"

    def deserialize(self, b: bytes) -> bool:
        assert b in (b"\x00", b"\x01")
        return b == b"\x01"

    def hash_tree_root(self, v) -> bytes:
        return self.serialize(v) + b"\x00" * 31

    def default(self) -> bool:
        return False


boolean = Boolean()


class ByteVector(SSZType):
    def __init__(self, n: int):
        self.n = n
        self.fixed_size = n

    def serialize(self, v) -> bytes:
        v = bytes(v)
        assert len(v) == self.n
        return v

    def deserialize(self, b: bytes) -> bytes:
        assert len(b) == self.n
        return bytes(b)

    def hash_tree_root(self, v) -> bytes:
        return merkleize_chunks(_pack_bytes(bytes(v)),
                                limit=(self.n + CHUNK - 1) // CHUNK)

    def default(self) -> bytes:
        return b"\x00" * self.n


Bytes4 = ByteVector(4)
Bytes20 = ByteVector(20)
Bytes32 = ByteVector(32)
Bytes48 = ByteVector(48)
Bytes96 = ByteVector(96)


class ByteList(SSZType):
    def __init__(self, limit: int):
        self.limit = limit

    def serialize(self, v) -> bytes:
        assert len(v) <= self.limit
        return bytes(v)

    def deserialize(self, b: bytes) -> bytes:
        assert len(b) <= self.limit
        return bytes(b)

    def hash_tree_root(self, v) -> bytes:
        root = merkleize_chunks(_pack_bytes(bytes(v)),
                                limit=(self.limit + CHUNK - 1) // CHUNK)
        return _mix_in_length(root, len(v))

    def default(self) -> bytes:
        return b""


class Bitvector(SSZType):
    def __init__(self, n: int):
        self.n = n
        self.fixed_size = (n + 7) // 8

    def serialize(self, v: Sequence[bool]) -> bytes:
        assert len(v) == self.n
        out = bytearray(self.fixed_size)
        for i, bit in enumerate(v):
            if bit:
                out[i // 8] |= 1 << (i % 8)
        return bytes(out)

    def deserialize(self, b: bytes) -> TList[bool]:
        assert len(b) == self.fixed_size
        return [bool(b[i // 8] >> (i % 8) & 1) for i in range(self.n)]

    def hash_tree_root(self, v) -> bytes:
        return merkleize_chunks(_pack_bytes(self.serialize(v)),
                                limit=(self.n + 255) // 256)

    def default(self) -> TList[bool]:
        return [False] * self.n


class Bitlist(SSZType):
    def __init__(self, limit: int):
        self.limit = limit

    def serialize(self, v: Sequence[bool]) -> bytes:
        assert len(v) <= self.limit
        out = bytearray(len(v) // 8 + 1)
        for i, bit in enumerate(v):
            if bit:
                out[i // 8] |= 1 << (i % 8)
        out[len(v) // 8] |= 1 << (len(v) % 8)      # delimiter bit
        return bytes(out)

    def deserialize(self, b: bytes) -> TList[bool]:
        assert b and b[-1] != 0, "missing delimiter"
        nbits = (len(b) - 1) * 8 + b[-1].bit_length() - 1
        assert nbits <= self.limit
        return [bool(b[i // 8] >> (i % 8) & 1) for i in range(nbits)]

    def hash_tree_root(self, v) -> bytes:
        data = bytearray((len(v) + 7) // 8)       # NO delimiter in chunks
        for i, bit in enumerate(v):
            if bit:
                data[i // 8] |= 1 << (i % 8)
        root = merkleize_chunks(_pack_bytes(bytes(data)),
                                limit=(self.limit + 255) // 256)
        return _mix_in_length(root, len(v))

    def default(self) -> TList[bool]:
        return []


def _is_basic(t: SSZType) -> bool:
    return isinstance(t, (Uint, Boolean))


class Vector(SSZType):
    def __init__(self, elem: SSZType, n: int):
        self.elem = elem
        self.n = n
        self.fixed_size = elem.fixed_size * n if elem.is_fixed else None

    def serialize(self, v) -> bytes:
        assert len(v) == self.n
        return _serialize_seq(self.elem, v)

    def deserialize(self, b: bytes):
        return _deserialize_seq(self.elem, b, exact=self.n)

    def hash_tree_root(self, v) -> bytes:
        if _is_basic(self.elem):
            data = b"".join(self.elem.serialize(x) for x in v)
            limit = (self.n * self.elem.fixed_size + CHUNK - 1) // CHUNK
            return merkleize_chunks(_pack_bytes(data), limit=limit)
        return merkleize_chunks([self.elem.hash_tree_root(x) for x in v],
                                limit=self.n)

    def default(self):
        return [self.elem.default() for _ in range(self.n)]


class List(SSZType):
    def __init__(self, elem: SSZType, limit: int):
        self.elem = elem
        self.limit = limit

    def serialize(self, v) -> bytes:
        assert len(v) <= self.limit
        return _serialize_seq(self.elem, v)

    def deserialize(self, b: bytes):
        out = _deserialize_seq(self.elem, b, exact=None)
        assert len(out) <= self.limit
        return out

    def hash_tree_root(self, v) -> bytes:
        if _is_basic(self.elem):
            data = b"".join(self.elem.serialize(x) for x in v)
            limit = (self.limit * self.elem.fixed_size + CHUNK - 1) // CHUNK
            root = merkleize_chunks(_pack_bytes(data), limit=limit)
        else:
            root = merkleize_chunks(
                [self.elem.hash_tree_root(x) for x in v], limit=self.limit)
        return _mix_in_length(root, len(v))

    def default(self):
        return []


def _serialize_seq(elem: SSZType, v) -> bytes:
    if elem.is_fixed:
        return b"".join(elem.serialize(x) for x in v)
    parts = [elem.serialize(x) for x in v]
    off = OFFSET_SIZE * len(parts)
    head = b""
    for p in parts:
        head += off.to_bytes(OFFSET_SIZE, "little")
        off += len(p)
    return head + b"".join(parts)


def _deserialize_seq(elem: SSZType, b: bytes, exact: int | None):
    if elem.is_fixed:
        sz = elem.fixed_size
        assert len(b) % sz == 0
        n = len(b) // sz
        if exact is not None:
            assert n == exact
        return [elem.deserialize(b[i * sz:(i + 1) * sz]) for i in range(n)]
    if not b:
        assert exact in (None, 0)
        return []
    first = int.from_bytes(b[:OFFSET_SIZE], "little")
    assert first % OFFSET_SIZE == 0
    n = first // OFFSET_SIZE
    if exact is not None:
        assert n == exact
    offs = [int.from_bytes(b[i * OFFSET_SIZE:(i + 1) * OFFSET_SIZE], "little")
            for i in range(n)] + [len(b)]
    return [elem.deserialize(b[offs[i]:offs[i + 1]]) for i in range(n)]


class Container(SSZType):
    def __init__(self, name: str, fields: Sequence[Tuple[str, SSZType]]):
        self.name = name
        self.fields = list(fields)
        if all(t.is_fixed for _, t in self.fields):
            self.fixed_size = sum(t.fixed_size for _, t in self.fields)

    def serialize(self, v) -> bytes:
        head, tail = b"", b""
        fixed_len = sum(t.fixed_size if t.is_fixed else OFFSET_SIZE
                        for _, t in self.fields)
        off = fixed_len
        for fname, t in self.fields:
            x = getattr(v, fname)
            if t.is_fixed:
                head += t.serialize(x)
            else:
                part = t.serialize(x)
                head += off.to_bytes(OFFSET_SIZE, "little")
                tail += part
                off += len(part)
        return head + tail

    def deserialize(self, b: bytes) -> SimpleNamespace:
        pos = 0
        var_fields: TList[Tuple[str, SSZType, int]] = []
        vals: dict = {}
        for fname, t in self.fields:
            if t.is_fixed:
                vals[fname] = t.deserialize(b[pos:pos + t.fixed_size])
                pos += t.fixed_size
            else:
                var_fields.append(
                    (fname, t,
                     int.from_bytes(b[pos:pos + OFFSET_SIZE], "little")))
                pos += OFFSET_SIZE
        bounds = [off for _, _, off in var_fields] + [len(b)]
        for i, (fname, t, off) in enumerate(var_fields):
            vals[fname] = t.deserialize(b[off:bounds[i + 1]])
        return SimpleNamespace(**vals)

    def field_roots(self, v) -> TList[bytes]:
        return [t.hash_tree_root(getattr(v, fname))
                for fname, t in self.fields]

    def hash_tree_root(self, v) -> bytes:
        return merkleize_chunks(self.field_roots(v))

    def default(self) -> SimpleNamespace:
        return SimpleNamespace(
            **{fname: t.default() for fname, t in self.fields})


class Opaque(SSZType):
    """Composite list-element placeholder: a type whose values are never
    constructed (empty lists only). One chunk per element when merkleized,
    which is all an empty List needs for its limit math."""
    fixed_size = None

    def serialize(self, v) -> bytes:           # pragma: no cover
        raise NotImplementedError(f"opaque element")

    def deserialize(self, b: bytes):           # pragma: no cover
        raise NotImplementedError(f"opaque element")

    def hash_tree_root(self, v) -> bytes:      # pragma: no cover
        raise NotImplementedError(f"opaque element")
