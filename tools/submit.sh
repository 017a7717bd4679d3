#!/usr/bin/env bash
# Package crawlspark/ as a --py-files zip and run a golden-checked crawl
# under spark-submit on a real multi-executor master.
#
# Usage: tools/submit.sh <master> <workdir> <n_seeds> [extra submit_crawl args...]
#   e.g. tools/submit.sh 'local-cluster[2,2,1024]' /tmp/crawl-wd 300
#
# local-cluster[N,cores,mem] launches N separate executor JVMs — the
# sandbox stand-in for an N-executor cluster; the same command line with
# --master yarn/k8s is the production path.
set -euo pipefail

MASTER="$1"; WORKDIR="$2"; N_SEEDS="$3"; shift 3

ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
STAGE="$(mktemp -d)"
trap 'rm -rf "$STAGE"' EXIT
ZIP="$STAGE/crawlspark.zip"

python - "$ROOT" "$ZIP" <<'PY'
import os, sys, zipfile
root, zpath = sys.argv[1], sys.argv[2]
with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
    for dirpath, dirnames, filenames in os.walk(os.path.join(root, "crawlspark")):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for f in filenames:
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                z.write(full, os.path.relpath(full, root))
PY

export PYSPARK_PYTHON="${PYSPARK_PYTHON:-$(command -v python)}"
export PYSPARK_DRIVER_PYTHON="$PYSPARK_PYTHON"
# must be in the JVM env BEFORE launch: local-cluster executor JVMs (and
# their Python workers) inherit it from spark-submit, not from the
# Python driver's os.environ
export CRAWLSPARK_IMG_SCALE="${CRAWLSPARK_IMG_SCALE:-1}"

exec /opt/spark/bin/spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --driver-memory 4g \
  --conf spark.ui.enabled=false \
  "$ROOT/tools/submit_crawl.py" "$WORKDIR" "$N_SEEDS" "$@"
