#!/usr/bin/env bash
# Build dist/engine.zip for `spark-submit --py-files dist/engine.zip`.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/engine.zip
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("dist/engine.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted((root / "archvisier_spark").rglob("*.py")):
        z.write(p, p.as_posix())
print("dist/engine.zip written:", len(z.namelist()), "files")
EOF
