# Developer entry points (parity with the reference's Makefile targets:
# test / bench / lint — Makefile:79-110 there).

PY ?= python

.PHONY: test test-fast bench bench-full bench-headline scaling native clean \
	baseline lint parity ci

# one-command release gate: lint -> CPU suite (incl. interpret-mode kernel
# parity; fast leg skips `-m slow` tests) -> if a real TPU answers a bounded
# probe, hardware parity (writes the hybrid hardware-verification marker on
# all-PASS) + headline bench. TPU legs self-skip with a reason when the
# tunnel is down. `make ci FULL=1` runs the slow tests too (nightly leg).
ci:
	FULL=$(FULL) $(PY) tools/ci_gate.py

# static-analysis gate, warnings-as-errors (clippy -D warnings parity,
# reference Makefile:51-63; this image has no ruff/mypy, so the gate is the
# repo's AST linter — see tools/lint.py for the check list)
lint:
	$(PY) tools/lint.py

# measured per-core AVX512 CPU baseline (the headline denominator's
# provenance; see BASELINE.md)
baseline:
	g++ -O3 -march=native -std=c++17 -o /tmp/baseline_avx512 \
		benches/baseline_avx512.cpp
	/tmp/baseline_avx512 16384

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -m "not slow"

# criterion-parity grid (representative sizes)
bench:
	$(PY) benches/run.py

# the reference's full n grid (slow: many shapes to compile)
bench-full:
	$(PY) benches/run.py --full

# the driver headline metric (one JSON line)
bench-headline:
	$(PY) bench.py

# multi-chip scaling harness (runs on whatever mesh is available)
scaling:
	$(PY) benches/scaling.py

# on-device bit-exactness of every Pallas kernel shape (REAL TPU; run after
# any kernel change and commit the PASS log — Mosaic miscompiles are real)
parity:
	$(PY) tools/tpu_parity.py

# force-rebuild the native host-math library
native:
	rm -f concrete_ntt_tpu/_native/hostmath.so
	$(PY) -c "from concrete_ntt_tpu import _native; assert _native.lib() is not None, 'toolchain unavailable'; print('native tier OK')"

clean:
	rm -f concrete_ntt_tpu/_native/hostmath.so
	find . -name __pycache__ -type d -exec rm -rf {} +
