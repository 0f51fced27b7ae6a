# ecckd_tpu top-level build glue.
#
# Counterpart of the reference's Makefile (/root/reference/Makefile:1-62,
# which builds librte_ecckd.{a,so} and the example executables).  Here the
# compiled artifact is the native netCDF3 I/O engine (native/Makefile); the
# compute path is JAX/XLA/Pallas and needs no ahead-of-time build.
#
# Targets:
#   make            build the native I/O library
#   make test       build + run the full test suite (the reference's
#                   `make test` only COMPILES its examples; ours executes)
#   make bench      one-line JSON throughput benchmark on the local device
#   make clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

# On-chip correctness gates: the REQUIRED check before committing any
# kernel change (rewrites PARITY_CHIP.json; see .claude/skills/verify).
verify: native
	python tools/chip_parity.py
	python bench.py

clean:
	$(MAKE) -C native clean

.PHONY: all native test bench verify clean
