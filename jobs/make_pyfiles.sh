#!/bin/sh
# Package dedup_spark for spark-submit --py-files (SURVEY.md §2 B40).
set -e
cd "$(dirname "$0")/.."
rm -f dedup_spark.zip
zip -qr dedup_spark.zip dedup_spark -x '*__pycache__*'
echo "wrote $(pwd)/dedup_spark.zip"
