#!/bin/bash
# Regenerate the committed API reference (docs/api/) — the analogue of the
# reference's update-docs.sh + Doxyfile.
set -euo pipefail
cd "$(dirname "$0")/.."
python docs/gen_api_docs.py
