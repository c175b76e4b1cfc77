#!/usr/bin/env bash
# CI entry point (parity with the reference's test.sh: build + unittest).
# No codegen build step exists; the optional native extension builds via pip.
set -e
cd "$(dirname "$0")"

pip install -e . --no-deps --no-build-isolation -q

python -m pytest tests/ -x -q

python __graft_entry__.py
