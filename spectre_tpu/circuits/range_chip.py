"""RangeChip — halo2-base RangeInstructions analog.

Decomposes values into `lookup_bits`-bit limbs pinned into the range-lookup
column; the last partial limb is additionally checked shifted, exactly like
halo2-base's range_check (consumed by the reference at
sync_step_circuit.rs:71-78 via RangeChip::default)."""
from __future__ import annotations

from typing import List

from ..fields.params import BN254_FR as FR
from .builder import CircuitBuilder, Context, AssignedValue


class RangeChip:
    def __init__(self, builder: CircuitBuilder, lookup_bits: int):
        assert builder.lookup_bits in (None, lookup_bits)
        builder.lookup_bits = lookup_bits
        self.builder = builder
        self.lookup_bits = lookup_bits

    def range_check(self, ctx: Context, a: AssignedValue, n_bits: int):
        """Constrain 0 <= a < 2^n_bits."""
        lb = self.lookup_bits
        k = (n_bits + lb - 1) // lb
        rem = n_bits - (k - 1) * lb  # bits in the last limb
        limbs = [(a.value >> (lb * i)) & ((1 << lb) - 1) for i in range(k)]
        limb_avs = ctx.assign_many(limbs)
        for av in limb_avs:
            ctx.pin_lookup(av)
        # recomposition
        s = ctx.inner_product(limb_avs, [pow(2, lb * i, FR) for i in range(k)])
        ctx.constrain_equal(s, a)
        # last limb must fit rem bits: shift it up and look it up again
        if rem < lb:
            shifted = ctx.mul_const(limb_avs[-1], 1 << (lb - rem))
            ctx.pin_lookup(shifted)
        return limb_avs

    def check_less_than(self, ctx: Context, a: AssignedValue,
                        b: AssignedValue, n_bits: int):
        """Constrain a < b given both < 2^n_bits."""
        # a < b  <=>  a - b + 2^n_bits  in [0, 2^n_bits)
        shifted = ctx.add_const(ctx.sub(a, b), 1 << n_bits)
        # value must be < 2^n_bits (i.e. borrow happened)
        self.range_check(ctx, shifted, n_bits)

    def is_less_than(self, ctx: Context, a: AssignedValue, b: AssignedValue,
                     n_bits: int) -> AssignedValue:
        """Returns the indicator bit of a < b (both < 2^n_bits)."""
        val = (a.value - b.value + (1 << (n_bits + 1))) % FR
        # a - b + 2^{n+1}: bit n+... if a < b the (n_bits)-th bit of
        # (a - b + 2^n_bits) is 0. Witness the shifted difference bits.
        shifted = ctx.add_const(ctx.sub(a, b), 1 << n_bits)
        bits = ctx.num_to_bits(shifted, n_bits + 1)
        # top bit == 1 iff a >= b
        return ctx.sub(ctx.load_constant(1), bits[n_bits])
