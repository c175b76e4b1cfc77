#!/usr/bin/env bash
# CI entry point (parity with the reference's test.sh: build + unittest).
# No codegen build step exists; the optional native extension builds via pip.
set -e
cd "$(dirname "$0")"

pip install -e . --no-deps --no-build-isolation -q

# static gate (the reference runs ruff+ty, test.sh:18-19; no linter ships
# in this image, so compile-check every source tree instead)
python -m compileall -q rednose_tpu tests examples tools bench.py __graft_entry__.py

python -m pytest tests/ -x -q

python __graft_entry__.py
