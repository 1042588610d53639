#!/bin/sh
# Package the engine for spark-submit --py-files.
set -eu
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/frechetrange_spark.zip
python - <<'EOF'
import os
import zipfile

with zipfile.ZipFile("dist/frechetrange_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("frechetrange_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/frechetrange_spark.zip")
EOF
