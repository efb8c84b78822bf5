#!/usr/bin/env bash
# Package stratum_spark for cluster submission:
#   tools/make_pyfiles.sh [outdir]   -> <outdir>/stratum_spark.zip
# Then run on a real cluster (the sandbox has no cluster; local[] mode is
# the tested path):
#   spark-submit --py-files stratum_spark.zip \
#     --conf spark.sql.adaptive.enabled=true \
#     --conf spark.sql.shuffle.partitions=<2-3x total cores> \
#     your_job.py
# your_job.py imports `stratum_spark` exactly as the tests do; the lake
# root becomes an object-store prefix and the O_EXCL snapshot CAS maps to
# a catalog/lock-service conditional put (see lake/table.py docstring).
set -euo pipefail
cd "$(dirname "$0")/.."
out="${1:-.}"
mkdir -p "$out"
rm -f "$out/stratum_spark.zip"
zip -qr "$out/stratum_spark.zip" stratum_spark -x '*__pycache__*'
echo "wrote $out/stratum_spark.zip"
unzip -l "$out/stratum_spark.zip" | tail -1
