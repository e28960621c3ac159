#!/usr/bin/env bash
# Package riko_spark for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/riko_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/riko_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("riko_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("dist/riko_spark.zip")
EOF
