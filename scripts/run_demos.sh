#!/usr/bin/env bash
# Canonical demo runs (reference scripts/run_demos.sh:5-22 analog).
# Uses the synthetic siftsmall-shaped dataset because the reference's
# siftsmall base/learn fvecs are missing large blobs.
set -euo pipefail
cd "$(dirname "$0")/.."

PY=${PYTHON:-python}

echo "== demo_vaq (VAQ256m32min7max8var1,HEAP k=100 refine 100,200) =="
$PY -m vaq_tpu.cli.demo_vaq \
    --synthetic 10000 --timeseries-size 128 --queries-size 100 \
    --method "VAQ256m32min7max8var1,HEAP" --k 100 --refine 100,200

echo "== demo_binary (256-bit scalar quantizer, rerank 10x) =="
$PY -m vaq_tpu.cli.demo_binary \
    --synthetic 10000 --timeseries-size 128 --queries-size 100 \
    --bit-budget 256 --k 100 --rerank 10

echo "== demo_cluster (k-means 100 clusters) =="
$PY -m vaq_tpu.cli.demo_cluster --synthetic 10000 --timeseries-size 128 \
    --k 100 --silhouette
