"""In-circuit Poseidon vs native sponge; mock-verified."""
from spectre_tpu.circuits import CircuitBuilder
from spectre_tpu.circuits.poseidon_gadget import PoseidonSpongeGadget, g1_array_poseidon_gadget
from spectre_tpu.hashes.poseidon import PoseidonNative, _g1_array_poseidon_native
from spectre_tpu.fields import limb as L
from spectre_tpu.plonk.mock import MockProver


def test_gadget_matches_native_sponge():
    b = CircuitBuilder()
    ctx = b.main()
    g = PoseidonSpongeGadget(ctx)
    inputs = [3, 1, 4, 1, 5, 9, 2, 6]
    g.update(ctx.assign_many(inputs))
    out = g.squeeze()

    nat = PoseidonNative()
    nat.update(inputs)
    assert out.value == nat.squeeze()


def test_gadget_onion_matches_native(rng):
    xs = [rng.randrange(1 << 380) for _ in range(4)]
    signs = [bool(rng.randrange(2)) for _ in range(4)]
    want = _g1_array_poseidon_native(xs, signs)

    b = CircuitBuilder()
    ctx = b.main()
    pairs = []
    for x in xs:
        bb = x.to_bytes(48, "little")
        pairs.append(ctx.assign_many([
            int.from_bytes(bb[:26], "little"),
            int.from_bytes(bb[26:], "little"),
        ]))
    packed = 0
    for i, s in enumerate(signs):
        packed |= int(s) << i
    y_packed = ctx.assign_many([packed])
    out = g1_array_poseidon_gadget(ctx, pairs, y_packed)
    assert out.value == want


def test_sponge_circuit_mock_verifies():
    b = CircuitBuilder()
    ctx = b.main()
    g = PoseidonSpongeGadget(ctx)
    g.update(ctx.assign_many([7, 8, 9]))
    out = g.squeeze()
    b.expose_public(out)
    # ~35k cells at k=13 (8185 usable rows) forces the multi-column layout
    k = 13
    cs, fixed, advice, instances = b.compile(k)
    spec = L.fr_spec
    n = 1 << k
    cols = []
    fi = ai = 0
    inst_cols = [list(v) + [0] * (n - len(v)) for v in instances]
    ii = 0
    for col in cs.columns:
        if col.kind == "fixed":
            cols.append(spec.encode_batch(fixed[fi])); fi += 1
        elif col.kind == "advice":
            cols.append(spec.encode_batch(advice[ai])); ai += 1
        else:
            cols.append(spec.encode_batch(inst_cols[ii])); ii += 1
    assert MockProver(cs, n, cols).verify() == []
