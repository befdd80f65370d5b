#!/usr/bin/env bash
# Build the tcnerf training image (reference build_dev.sh / build_training_server.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
docker build -f infra/Dockerfile -t tcnerf/train:latest .
