#!/usr/bin/env bash
# Converge .jax_cache_cpu until `pytest tests/` is green.
#
# XLA:CPU on this box sporadically SIGSEGVs inside compile or
# executable-serialize once a single process has done many large
# limb-plane compiles (see conftest.py's forked-write workaround; the
# compile-path crash cannot be contained in-process). The fix is
# operational: every run caches the programs it compiled before
# crashing, and the test that crashed is re-run ALONE in a fresh
# process (few prior compiles -> reliably succeeds and caches), so a
# bounded number of iterations converges to a fully-warm cache and a
# green, compile-free suite -- which is what CI and fresh checkouts
# then run.
#
# Usage: tests/converge_cache.sh [max_iters] [extra pytest args...]
set -u
cd "$(dirname "$0")/.."
max=${1:-8}
shift 2>/dev/null || true
log=$(mktemp /tmp/converge_pytest.XXXX.log)
for i in $(seq 1 "$max"); do
  echo "=== iteration $i: full suite ==="
  python -m pytest tests/ -q "$@" >"$log" 2>&1
  code=$?
  tail -1 "$log"
  if [ "$code" -eq 0 ]; then
    echo "=== suite green after $i iteration(s) ==="
    exit 0
  fi
  # crashed: find the last test file mentioned in the fault dump and
  # warm it alone in a fresh process
  tf=$(grep -o 'tests/test_[a-z0-9_]*\.py' "$log" | tail -1)
  echo "--- suite exited $code; warming ${tf:-nothing} alone ---"
  if [ -n "$tf" ]; then
    python -m pytest "$tf" -q "$@" >>"$log" 2>&1 || true
  fi
done
echo "=== NOT green after $max iterations; last log: $log ==="
exit 1
