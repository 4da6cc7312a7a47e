# spectre-tpu automation (the reference justfile analog)

.PHONY: test test-fast test-heavy bench fixtures lint

test:
	python -m pytest tests/ -q

# skip the slow whole-circuit mocks (committee update, k>=16 sponges)
test-fast:
	python -m pytest tests/ -q --deselect tests/test_committee_update_circuit.py::test_circuit_mock_verifies

# nightly tier: minute-plus tests (heavy) + multi-million-cell mocks (slow)
test-heavy:
	python -m pytest tests/ -q -m "heavy or slow"

bench:
	python bench.py

# regenerate synthetic fixtures (unit_test_gen analog) into ./test_fixtures
fixtures:
	python -c "from spectre_tpu.witness.test_gen import generate_fixtures; \
from spectre_tpu.specs import Spec; \
generate_fixtures('test_fixtures', Spec(name='nano', sync_committee_size=4))"

committee-poseidon:
	python -m spectre_tpu.service.cli utils committee-poseidon \
	  --pubkeys /root/reference/test_data/committee_pubkeys_512.json
