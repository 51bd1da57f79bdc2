#!/usr/bin/env bash
# One-command live-emulator gate (VERDICT r12 #5): the day an environment
# has the Bigtable emulator + SDK, this runs the reference's actual CI
# workflow (Makefile:1-15, .github/workflows/rust.yml:22-38 — test against
# a local emulator) over our adapter: tests/test_emulator.py tier 2 drives
# the golden composite-key cells write-then-read through the live emulator
# and matches the in-process fake byte-for-byte.
#
# Requirements (both absent in the build sandbox, which also prescribes no
# pip/apt installs — the blocked state is recorded in SCALE.md):
#   1. pip install google-cloud-bigtable
#   2. an emulator:  gcloud beta emulators bigtable start  (or the
#      docker image google/cloud-sdk emulators)
#
# Usage:
#   tools/run_emulator_gate.sh                # expects emulator on :8086
#   BIGTABLE_EMULATOR_HOST=host:port tools/run_emulator_gate.sh
set -euo pipefail
cd "$(dirname "$0")/.."

export BIGTABLE_EMULATOR_HOST="${BIGTABLE_EMULATOR_HOST:-localhost:8086}"

if ! python -c "import google.cloud.bigtable" 2>/dev/null; then
  echo "BLOCKED: google-cloud-bigtable is not installed." >&2
  echo "  -> pip install google-cloud-bigtable" >&2
  exit 2
fi
if ! python - <<'EOF'
import os, socket
host, _, port = os.environ["BIGTABLE_EMULATOR_HOST"].partition(":")
s = socket.socket()
s.settimeout(2)
try:
    s.connect((host, int(port or 8086)))
except OSError:
    raise SystemExit(1)
EOF
then
  echo "BLOCKED: no emulator listening at $BIGTABLE_EMULATOR_HOST." >&2
  echo "  -> gcloud beta emulators bigtable start --host-port=$BIGTABLE_EMULATOR_HOST" >&2
  exit 3
fi

exec python -m pytest tests/test_emulator.py -v
