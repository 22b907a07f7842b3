#!/usr/bin/env bash
# Parity with the reference's docker-entrypoint.sh: optional preprocess +
# train driven by env vars, then serve.
set -e

if [ -n "$MB_DATASETS_ROOT" ]; then
    echo "Preprocessing $MB_DATASET from $MB_DATASETS_ROOT"
    python -m mockingbird_tpu.cli preprocess "$MB_DATASETS_ROOT" \
        -d "${MB_DATASET:-aidatatang_200zh}" -s
    python -m mockingbird_tpu.cli embed "$MB_DATASETS_ROOT/SV2TTS/synthesizer"
fi

if [ -n "$MB_TRAIN" ]; then
    python -m mockingbird_tpu.cli train-synth \
        "$MB_DATASETS_ROOT/SV2TTS/synthesizer" "${MB_RUN_ID:-docker_run}" &
fi

exec python -m mockingbird_tpu.cli serve --port "${MB_PORT:-8080}"
