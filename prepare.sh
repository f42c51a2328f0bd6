#!/usr/bin/env bash
# Workspace preparation (parity with the reference's prepare.sh:1-43, minus
# conda: jax/flax/optax and friends are preinstalled in this image).
set -euo pipefail

mkdir -p results/img results/logs logs data/metadata save_models \
         dataset/processed dataset/sorted_dataset

echo "Directories ready. Run stages as modules, e.g.:"
echo "  python -m multimodal_biometric_fingerprints_palms_tpu.pipeline --skip-ssl"
echo "  python -m multimodal_biometric_fingerprints_palms_tpu.matching.runner --demo"
echo "Tests: python -m pytest tests/ -x -q"
