#!/usr/bin/env bash
# Full test suite, split into two pytest processes.
#
# Running everything in ONE process segfaults this jaxlib's CPU compiler
# partway through: after ~60 compile-heavy tests the 8-virtual-device pjit
# compile of the multichip tests dies with SIGSEGV inside
# backend_compile_and_load (reproducibly at the same spot; the same tests
# pass cleanly in a fresh process). Until the jaxlib is fixed, run the
# multichip tests in their own interpreter.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q --deselect tests/test_multichip.py \
    --deselect tests/test_multichip_discover.py "$@"
python -m pytest tests/test_multichip.py tests/test_multichip_discover.py -q "$@"
