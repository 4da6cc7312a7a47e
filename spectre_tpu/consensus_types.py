"""Light-client SSZ container codecs (Capella, Minimal preset).

The ethereum-consensus-types analog: just enough SSZ (de)serialization to
read/write the consensus-spec-tests light-client fixtures
(`bootstrap.ssz_snappy`, `update_*.ssz_snappy`) that the reference's
test-utils loader consumes (test-utils/src/lib.rs:87-131).

SSZ wire rules implemented: fixed-size fields inline; variable-size fields
as 4-byte LE offsets into a trailing heap, in field order. Minimal preset
sizes: SYNC_COMMITTEE_SIZE=32, BYTES_PER_LOGS_BLOOM=256,
MAX_EXTRA_DATA_BYTES=32.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

from .ssz import BeaconBlockHeader, ExecutionPayloadHeader

SYNC_COMMITTEE_SIZE = 32           # minimal preset
FINALIZED_ROOT_DEPTH = 6           # finality_branch length
NEXT_SYNC_COMMITTEE_DEPTH = 5
EXECUTION_PAYLOAD_DEPTH = 4


def _u64(b): return int.from_bytes(b, "little")


def _p64(v): return int(v).to_bytes(8, "little")


# ------------------------------------------------------------ fixed parts

def decode_beacon_header(b: bytes) -> BeaconBlockHeader:
    assert len(b) == 112
    return BeaconBlockHeader(
        slot=_u64(b[0:8]), proposer_index=_u64(b[8:16]),
        parent_root=b[16:48], state_root=b[48:80], body_root=b[80:112])


def encode_beacon_header(h: BeaconBlockHeader) -> bytes:
    return (_p64(h.slot) + _p64(h.proposer_index) + bytes(h.parent_root)
            + bytes(h.state_root) + bytes(h.body_root))


@dataclass
class SyncCommittee:
    pubkeys: List[bytes]           # 32 x 48 compressed
    aggregate_pubkey: bytes        # 48

    SIZE = 48 * (SYNC_COMMITTEE_SIZE + 1)

    @classmethod
    def decode(cls, b: bytes) -> "SyncCommittee":
        assert len(b) == cls.SIZE
        pks = [b[48 * i:48 * (i + 1)] for i in range(SYNC_COMMITTEE_SIZE)]
        return cls(pubkeys=pks, aggregate_pubkey=b[-48:])

    def encode(self) -> bytes:
        assert len(self.pubkeys) == SYNC_COMMITTEE_SIZE
        return b"".join(self.pubkeys) + self.aggregate_pubkey


@dataclass
class SyncAggregate:
    sync_committee_bits: List[bool]    # Bitvector[32] -> 4 bytes
    sync_committee_signature: bytes    # 96

    SIZE = SYNC_COMMITTEE_SIZE // 8 + 96

    @classmethod
    def decode(cls, b: bytes) -> "SyncAggregate":
        assert len(b) == cls.SIZE
        nb = SYNC_COMMITTEE_SIZE // 8
        bits = [bool((b[i // 8] >> (i % 8)) & 1)
                for i in range(SYNC_COMMITTEE_SIZE)]
        return cls(sync_committee_bits=bits, sync_committee_signature=b[nb:])

    def encode(self) -> bytes:
        nb = SYNC_COMMITTEE_SIZE // 8
        buf = bytearray(nb)
        for i, bit in enumerate(self.sync_committee_bits):
            if bit:
                buf[i // 8] |= 1 << (i % 8)
        return bytes(buf) + self.sync_committee_signature


# ------------------------------------------- execution payload (variable)

_EPH_FIXED = (32 + 20 + 32 + 32 + 256 + 32 + 8 * 4 + 4  # extra_data offset
              + 32 + 32 + 32 + 32)


def decode_execution_payload_header(b: bytes) -> ExecutionPayloadHeader:
    p = 0

    def take(n):
        nonlocal p
        out = b[p:p + n]
        p += n
        return out

    parent_hash = take(32)
    fee_recipient = take(20)
    state_root = take(32)
    receipts_root = take(32)
    logs_bloom = take(256)
    prev_randao = take(32)
    block_number = _u64(take(8))
    gas_limit = _u64(take(8))
    gas_used = _u64(take(8))
    timestamp = _u64(take(8))
    extra_off = int.from_bytes(take(4), "little")
    base_fee = int.from_bytes(take(32), "little")
    block_hash = take(32)
    transactions_root = take(32)
    withdrawals_root = take(32)
    extra_data = b[extra_off:]
    return ExecutionPayloadHeader(
        parent_hash=parent_hash, fee_recipient=fee_recipient,
        state_root=state_root, receipts_root=receipts_root,
        logs_bloom=logs_bloom, prev_randao=prev_randao,
        block_number=block_number, gas_limit=gas_limit, gas_used=gas_used,
        timestamp=timestamp, extra_data=extra_data,
        base_fee_per_gas=base_fee, block_hash=block_hash,
        transactions_root=transactions_root,
        withdrawals_root=withdrawals_root)


def encode_execution_payload_header(h: ExecutionPayloadHeader) -> bytes:
    fixed = (bytes(h.parent_hash) + bytes(h.fee_recipient)
             + bytes(h.state_root) + bytes(h.receipts_root)
             + bytes(h.logs_bloom) + bytes(h.prev_randao)
             + _p64(h.block_number) + _p64(h.gas_limit) + _p64(h.gas_used)
             + _p64(h.timestamp)
             + _EPH_FIXED.to_bytes(4, "little")
             + int(h.base_fee_per_gas).to_bytes(32, "little")
             + bytes(h.block_hash) + bytes(h.transactions_root)
             + bytes(h.withdrawals_root))
    return fixed + bytes(h.extra_data)


# --------------------------------------------------- light-client headers

@dataclass
class LightClientHeader:
    beacon: BeaconBlockHeader
    execution: ExecutionPayloadHeader
    execution_branch: List[bytes]      # 4 x 32

    @classmethod
    def decode(cls, b: bytes) -> "LightClientHeader":
        beacon = decode_beacon_header(b[0:112])
        exec_off = int.from_bytes(b[112:116], "little")
        branch = [b[116 + 32 * i:116 + 32 * (i + 1)]
                  for i in range(EXECUTION_PAYLOAD_DEPTH)]
        execution = decode_execution_payload_header(b[exec_off:])
        return cls(beacon=beacon, execution=execution,
                   execution_branch=branch)

    def encode(self) -> bytes:
        fixed_len = 112 + 4 + 32 * EXECUTION_PAYLOAD_DEPTH
        return (encode_beacon_header(self.beacon)
                + fixed_len.to_bytes(4, "little")
                + b"".join(bytes(x) for x in self.execution_branch)
                + encode_execution_payload_header(self.execution))


@dataclass
class LightClientBootstrap:
    header: LightClientHeader
    current_sync_committee: SyncCommittee
    current_sync_committee_branch: List[bytes]   # 5 x 32

    @classmethod
    def decode(cls, b: bytes) -> "LightClientBootstrap":
        hdr_off = int.from_bytes(b[0:4], "little")
        p = 4
        committee = SyncCommittee.decode(b[p:p + SyncCommittee.SIZE])
        p += SyncCommittee.SIZE
        branch = [b[p + 32 * i:p + 32 * (i + 1)]
                  for i in range(NEXT_SYNC_COMMITTEE_DEPTH)]
        return cls(header=LightClientHeader.decode(b[hdr_off:]),
                   current_sync_committee=committee,
                   current_sync_committee_branch=branch)

    def encode(self) -> bytes:
        fixed_len = 4 + SyncCommittee.SIZE + 32 * NEXT_SYNC_COMMITTEE_DEPTH
        return (fixed_len.to_bytes(4, "little")
                + self.current_sync_committee.encode()
                + b"".join(bytes(x)
                           for x in self.current_sync_committee_branch)
                + self.header.encode())


@dataclass
class LightClientUpdate:
    attested_header: LightClientHeader
    next_sync_committee: SyncCommittee
    next_sync_committee_branch: List[bytes]   # 5 x 32
    finalized_header: LightClientHeader
    finality_branch: List[bytes]              # 6 x 32
    sync_aggregate: SyncAggregate
    signature_slot: int

    @classmethod
    def decode(cls, b: bytes) -> "LightClientUpdate":
        att_off = int.from_bytes(b[0:4], "little")
        p = 4
        committee = SyncCommittee.decode(b[p:p + SyncCommittee.SIZE])
        p += SyncCommittee.SIZE
        nsc_branch = [b[p + 32 * i:p + 32 * (i + 1)]
                      for i in range(NEXT_SYNC_COMMITTEE_DEPTH)]
        p += 32 * NEXT_SYNC_COMMITTEE_DEPTH
        fin_off = int.from_bytes(b[p:p + 4], "little")
        p += 4
        fin_branch = [b[p + 32 * i:p + 32 * (i + 1)]
                      for i in range(FINALIZED_ROOT_DEPTH)]
        p += 32 * FINALIZED_ROOT_DEPTH
        agg = SyncAggregate.decode(b[p:p + SyncAggregate.SIZE])
        p += SyncAggregate.SIZE
        sig_slot = _u64(b[p:p + 8])
        return cls(
            attested_header=LightClientHeader.decode(b[att_off:fin_off]),
            next_sync_committee=committee,
            next_sync_committee_branch=nsc_branch,
            finalized_header=LightClientHeader.decode(b[fin_off:]),
            finality_branch=fin_branch,
            sync_aggregate=agg,
            signature_slot=sig_slot)

    def encode(self) -> bytes:
        fixed_len = (4 + SyncCommittee.SIZE
                     + 32 * NEXT_SYNC_COMMITTEE_DEPTH + 4
                     + 32 * FINALIZED_ROOT_DEPTH + SyncAggregate.SIZE + 8)
        att = self.attested_header.encode()
        fin = self.finalized_header.encode()
        return (fixed_len.to_bytes(4, "little")
                + self.next_sync_committee.encode()
                + b"".join(bytes(x)
                           for x in self.next_sync_committee_branch)
                + (fixed_len + len(att)).to_bytes(4, "little")
                + b"".join(bytes(x) for x in self.finality_branch)
                + self.sync_aggregate.encode()
                + _p64(self.signature_slot)
                + att + fin)
