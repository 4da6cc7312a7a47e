"""In-circuit Poseidon sponge over the builder DSL.

Matches the native sponge (hashes/poseidon.py) cell for cell — the analog of
halo2-base's PoseidonSponge used by the reference's g1_array_poseidon
(lightclient-circuits/src/poseidon.rs:42-95). The permutation uses the same
grain parameters; every state element is a circuit cell, constants enter as
fixed pins, and the MDS rows fold via inner products with constant bases.
"""
from __future__ import annotations

from typing import List

from ..fields.params import BN254_FR as FR
from ..hashes import poseidon as PN
from .builder import CircuitBuilder, Context, AssignedValue


class PoseidonSpongeGadget:
    def __init__(self, ctx: Context, t: int = PN.T, rate: int = PN.POSEIDON_SIZE,
                 r_f: int = PN.R_F, r_p: int = PN.R_P):
        self.ctx = ctx
        self.t, self.rate, self.r_f, self.r_p = t, rate, r_f, r_p
        self.constants, self.mds = PN.grain_params(t, r_f, r_p)
        init = ctx.load_constant((1 << 64) % FR)
        zero = ctx.load_zero()
        self.state: List[AssignedValue] = [init] + [zero] * (t - 1)
        self.absorbing: List[AssignedValue] = []

    def _sbox(self, x: AssignedValue) -> AssignedValue:
        x2 = self.ctx.mul(x, x)
        x4 = self.ctx.mul(x2, x2)
        return self.ctx.mul(x4, x)

    def _permute(self):
        ctx = self.ctx
        half = self.r_f // 2
        s = self.state
        for r in range(self.r_f + self.r_p):
            c = self.constants[r]
            s = [ctx.add_const(x, ci) for x, ci in zip(s, c)]
            if half <= r < half + self.r_p:
                s = [self._sbox(s[0])] + s[1:]
            else:
                s = [self._sbox(x) for x in s]
            s = [ctx.inner_product(s, self.mds[i]) for i in range(self.t)]
        self.state = s

    def update(self, elements: List[AssignedValue]):
        buf = self.absorbing + list(elements)
        self.absorbing = []
        i = 0
        while len(buf) - i >= self.rate:
            chunk = buf[i:i + self.rate]
            for j, e in enumerate(chunk):
                self.state[j + 1] = self.ctx.add(self.state[j + 1], e)
            self._permute()
            i += self.rate
        self.absorbing = buf[i:]

    def squeeze(self) -> AssignedValue:
        last = self.absorbing + [self.ctx.load_constant(1)]
        assert len(last) <= self.rate
        for j, e in enumerate(last):
            self.state[j + 1] = self.ctx.add(self.state[j + 1], e)
        self._permute()
        self.absorbing = []
        return self.state[0]


def g1_array_poseidon_gadget(ctx: Context, x_limb_pairs, y_signs_packed):
    """In-circuit committee commitment (poseidon.rs:42-95 semantics).

    x_limb_pairs: per pubkey a list of 2 AssignedValues (folded limbs);
    y_signs_packed: list of AssignedValues (pre-packed sign words).
    Returns the onion-commitment cell.
    """
    inputs: List[AssignedValue] = []
    for pair in x_limb_pairs:
        inputs.extend(pair)
    inputs.extend(y_signs_packed)
    sponge = PoseidonSpongeGadget(ctx)
    current = None
    step = PN.POSEIDON_SIZE - 2
    for i, off in enumerate(range(0, len(inputs), step)):
        sponge.update(inputs[off:off + step])
        if i != 0:
            sponge.update([current])
        current = sponge.squeeze()
    assert current is not None
    return current
