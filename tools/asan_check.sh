#!/bin/sh
# AddressSanitizer sweep of the native host engine (the reference's
# `make asan=1` analog).  Rebuilds libmpnative with ASan and runs the
# native + end-to-end DPP3 tests under it; any heap smash or OOB in the
# C engine aborts with a sanitizer report.
#
#   sh tools/asan_check.sh [pytest args...]
set -e
cd "$(dirname "$0")/.."
ASAN_RT=$(cc -print-file-name=libasan.so)
export MINIPROT_TPU_ASAN=1
export LD_PRELOAD="$ASAN_RT"
# leak checking off: Python itself "leaks" interned objects at exit
export ASAN_OPTIONS="detect_leaks=0:abort_on_error=1"
exec python -m pytest tests/test_native.py tests/test_edge_inputs.py \
    tests/test_e2e_dpp3.py -q "$@"
