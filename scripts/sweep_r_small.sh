#!/bin/bash
# Small-ray-tile sweep: the round-2 note proposed "NW=4 R=2 cuts
# tile-union waste while hiding fixed costs" but it was never measured
# on the honest renderer (round-3 re-sweep only covered R4/R8/R16).
# Per the bunny probes a 512-ray tile (R4) visits ~105 nodes while each
# ray needs ~7.3 — smaller tiles shrink the vote union; K2 already
# amortizes the extra serial trips. cbbunny 8spp depth 8.
cd "$(dirname "$0")/.."
run() {
    local label="$1"; shift
    echo "=== $label ($*)" | tee -a /tmp/r_sweep.log
    env "$@" SCENES=cbbunny BENCH_SPP=8 timeout 1200 \
        python scripts/perf_scenes.py 2>&1 | tail -3 | tee -a /tmp/r_sweep.log
}
run control-R4 TPU_RT_T8_R=4
run R2 TPU_RT_T8_R=2
run R2NW2 TPU_RT_T8_R=2 TPU_RT_T8_NWALK=2
run R1NW2 TPU_RT_T8_R=1 TPU_RT_T8_NWALK=2
run R2LG8 TPU_RT_T8_R=2 TPU_RT_T8_LG=8
run control-R4-again TPU_RT_T8_R=4
echo "=== sweep done" | tee -a /tmp/r_sweep.log
