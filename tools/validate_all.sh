#!/bin/sh
# Full validation: tests + differential oracle + bench. Exit nonzero on any failure.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python tools/check_oracle.py "${1:-/root/testdata/sf0.01}"
python bench.py
