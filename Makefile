# Developer entry points (parity with the reference Makefile targets).

PYTHON ?= python

.PHONY: test test-unit test-integration lint typecheck check bench serve ingest-self dryrun smoke

test:
	$(PYTHON) -m pytest tests/ -q

test-unit:
	$(PYTHON) -m pytest tests/ -q --ignore=tests/integration

test-integration:
	$(PYTHON) -m pytest tests/integration -q

# static lint: in-repo AST/symtable linter (ruff is not installable in this
# image; tools/lint.py covers F401/F811/F821/B006/F541/E722/W605)
lint:
	$(PYTHON) -m compileall -q semcode_tpu tests bench.py __graft_entry__.py tools
	$(PYTHON) tools/lint.py

# runtime typecheck: typeguard instruments every annotated semcode_tpu
# function during the test suite (mypy is not installable in this image)
typecheck:
	$(PYTHON) -m pytest tests/ -q --typeguard-packages=semcode_tpu

check: lint test typecheck

bench:
	$(PYTHON) bench.py

bench-smoke:
	BENCH_N=20000 BENCH_NLIST=64 BENCH_QUERIES=64 BENCH_ROUNDS=3 $(PYTHON) bench.py

serve:
	$(PYTHON) -m semcode_tpu.cli serve

ingest-self:
	$(PYTHON) -m semcode_tpu.cli ingest --name self --include semcode_tpu --root . --yes

# full product flow on the 8-device CPU mesh (no TPU lock needed):
# ingest -> incremental re-ingest -> filtered query -> chunks -> compact -> stats
smoke:
	$(PYTHON) tools/smoke.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 DRYRUN_DEVICES=8 \
		$(PYTHON) -c "import jax; jax.config.update('jax_platforms','cpu'); \
		import __graft_entry__ as g; g.dryrun_multichip(8)"

native:
	g++ -O3 -march=native -shared -fPIC -o native/libsemcode_native.so native/featurizer.cpp -lz
