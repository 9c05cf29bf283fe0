#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit (north_rule packaging).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/fastdup_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/fastdup_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("fastdup_spark"):
        if "__pycache__" in root:
            continue
        for fn in files:
            if fn.endswith(".py"):
                p = os.path.join(root, fn)
                z.write(p, p)
print("wrote dist/fastdup_spark.zip")
EOF
