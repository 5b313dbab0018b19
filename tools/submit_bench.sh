#!/usr/bin/env bash
# Package the engine as a zip and run the benchmark via spark-submit
# --py-files — the north-rule launch shape (BASELINE.json: "run via
# spark-submit --py-files on a multi-executor cluster").  On a real cluster
# swap --master for yarn/k8s; everything else is identical.
#
# Usage: tools/submit_bench.sh [--scaling] [extra bench.py args...]
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=build/engine.zip
mkdir -p build
rm -f "$ZIP"
# package only the library (bench.py is the driver script)
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("build/engine.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("pdf_parser_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("packaged", "build/engine.zip")
EOF

MASTER="local[${SPARK_GRAFT_CPUS:-16}]"
exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.ui.enabled=false \
  bench.py "$@"
