#!/bin/sh
# Regenerate the engine-independent PPRL goldens FROM SOURCE.
#
# The compiled .class is intentionally NOT committed (provenance: the oracle
# must be reproducible from the checked-in .java, never a stale binary).
# Run this after changing the PPRL fixture input or the reference semantics:
#
#   sh tools/regen_pprl_golden.sh
set -e
cd "$(dirname "$0")/.."
python tools/export_pprl_input.py
javac -encoding UTF-8 -d /tmp/pprl_golden_build tests/gen_pprl_golden.java
java -cp /tmp/pprl_golden_build gen_pprl_golden tests/golden
javac -encoding UTF-8 -d /tmp/pprl_golden_build tests/gen_pprl_enc_golden.java
java -cp /tmp/pprl_golden_build gen_pprl_enc_golden tests/golden
rm -rf /tmp/pprl_golden_build
echo "PPRL goldens regenerated under tests/golden/"
