# Test entry points (VERDICT r3 #7: the slow tier must be a committed,
# documented CI entry, not an opt-in flag).
#
#   make test       - fast tier (compile-light unit/semantics tests, ~4-10
#                     min cold on a 1-core host; the default pytest run)
#   make test-full  - EVERYTHING: fast tier + the slow tier (dp/multihost
#                     equivalence, e2e training, torch parity, mAP A/B,
#                     multichip dryrun). ~45-60 min cold on a 1-core host.
#                     Records suite hash + wall time to test-full.log and
#                     STATUS.md cites the last green run.
#
# Both tiers pin JAX to an 8-virtual-device CPU mesh via tests/conftest.py.

PYTEST ?= python -m pytest
# bash + pipefail so rc records PYTEST's status, not tee's (a /bin/sh
# pipeline's $? is the LAST command — the old recipe always logged rc: 0).
SHELL := /bin/bash

.PHONY: test test-full

test:
	$(PYTEST) tests/ -q

test-full:
	@echo "suite-hash: $$(git rev-parse HEAD 2>/dev/null || echo unknown)" | tee test-full.log
	@set -o pipefail; start=$$(date +%s); \
	$(PYTEST) tests/ -m "" -q 2>&1 | tail -5 | tee -a test-full.log; \
	rc=$$?; \
	end=$$(date +%s); \
	echo "wall: $$((end-start))s  rc: $$rc" | tee -a test-full.log; \
	exit $$rc
