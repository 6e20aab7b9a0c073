#!/bin/bash
# Honest re-sweep of the bvh8t kernel knobs on the post-recalibration
# renderer (the round-2 sweep table was measured on the corrupted build;
# docs/PERF_LOG.md "Correctness recalibration"). cbbunny 8spp depth 8.
cd "$(dirname "$0")/.."
run() {
    local label="$1"; shift
    echo "=== $label ($*)" | tee -a /tmp/t8_sweep.log
    env "$@" SCENES=cbbunny BENCH_SPP=8 timeout 900 \
        python scripts/perf_scenes.py 2>&1 | tail -3 | tee -a /tmp/t8_sweep.log
}
run baseline-W8R8NW2
run NW1 TPU_RT_T8_NWALK=1
run NW4 TPU_RT_T8_NWALK=4
run R16 TPU_RT_T8_R=16
run R4 TPU_RT_T8_R=4
run W16 TPU_RT_T8_W=16
run R16NW1 TPU_RT_T8_R=16 TPU_RT_T8_NWALK=1
echo "=== sweep done" | tee -a /tmp/t8_sweep.log
