#!/bin/bash
# North-rule launch-mode check: run the checkpointed pipeline via
# spark-submit --py-files with the package importable ONLY from the
# shipped zip (cwd = /, no repo on sys.path), twice — the second run
# must resume from the checkpoint store without rewriting any batch
# (store contents byte-stable) and report identical lineage.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
SF_DIR="${1:-/root/testdata/sf0.01}"
STORE="${2:-$(mktemp -d /tmp/gs_submit.XXXXXX)}"
ZIP=/tmp/gdal_spark_submit.zip
MASTER="${SPARK_SUBMIT_MASTER:-local[8]}"

rm -f "$ZIP"
(cd "$REPO" && zip -qr "$ZIP" gdal_spark -i 'gdal_spark/*.py')

run() {
  (cd / && spark-submit --master "$MASTER" --py-files "$ZIP" \
      "$REPO/tools/submit_app.py" --sf-dir "$SF_DIR" --store "$STORE" \
      2>/dev/null)
}

echo "== run 1 (cold) =="
R1=$(run); echo "$R1"
SNAP1=$(cd "$STORE" && find . -type f -printf '%p %s %T@\n' | sort | md5sum)
echo "== run 2 (resume) =="
R2=$(run); echo "$R2"
SNAP2=$(cd "$STORE" && find . -type f -printf '%p %s %T@\n' | sort | md5sum)

[ "$SNAP1" = "$SNAP2" ] || { echo "FAIL: store changed on resume"; exit 1; }
python3 - "$R1" "$R2" <<'EOF'
import json, sys
def report(out):
    rows = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    return {r["stage"]: r for r in rows}
a, b = report(sys.argv[1]), report(sys.argv[2])
assert a and a == b, (a, b)
assert all(r["rows"] > 0 for r in a.values()), a
print("SUBMIT SMOKE OK:", {s: a[s]["rows"] for s in a})
EOF
