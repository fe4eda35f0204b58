#!/usr/bin/env bash
# North-rule deployment shape: the bench job shipped with spark-submit
# --py-files (the package zip is what a multi-executor cluster distributes
# to its executors). Locally the master is local[N]; on a real cluster set
# MASTER (e.g. yarn / k8s://... / spark://...) and the same invocation works.
#
# Usage: tools/submit_bench.sh [cpus] (default 16)
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CPUS="${1:-${SPARK_GRAFT_CPUS:-16}}"
MASTER="${MASTER:-local[$CPUS]}"
ZIP="$(mktemp -d)/landlensdb_spark.zip"

(cd "$REPO" && python -c "
import zipfile, pathlib
z = zipfile.ZipFile('$ZIP', 'w', zipfile.ZIP_DEFLATED)
for p in sorted(pathlib.Path('landlensdb_spark').rglob('*.py')):
    z.write(p, str(p))
z.close()
print('packaged', '$ZIP')
")

SPARK_GRAFT_CPUS="$CPUS" exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.ui.enabled=false \
  "$REPO/bench.py"
