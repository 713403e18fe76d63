#!/bin/bash
# One-shot sample setup (reference: sample/setup-sample.sh, which builds the
# four Rust services + the extension; here everything is Python + plain JS,
# so setup = generate fixtures and zk parameters for the default set).
#
# usage: sample/setup-sample.sh [name]   (default rs256)
set -e
cd "$(dirname "$0")/.."

NAME="${1:-rs256}"
python -m crescent_tpu.cli gen-fixtures --name "$NAME"
python -m crescent_tpu.cli zksetup --name "$NAME"

echo
echo "Sample ready. Start the four services (ports 8001-8004) with:"
echo "  python -m crescent_tpu.sample.services test-vectors/$NAME/"
echo "Load the browser extension from sample/client/ (chrome://extensions,"
echo "Load unpacked)."
