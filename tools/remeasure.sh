#!/usr/bin/env bash
# Round-2/3 TPU re-measurement batch (run after ANY engine change).
#
# Serializes all TPU jobs with quiet gaps (the axon server needs ~2 min to
# reap each client's session; a client launched sooner hangs — CLAUDE.md).
# Check the tunnel FIRST: a dead relay makes every client hang forever.
#
#   bash tools/remeasure.sh [out.jsonl]
set -u
OUT="${1:-/tmp/remeasure.jsonl}"
cd "$(dirname "$0")/.."

if ! ss -tlnp 2>/dev/null | grep -q 8082; then
    echo '{"error": "axon tunnel relay is down (no listener on 8082)"}' \
        | tee "$OUT"
    exit 1
fi

probe() {
    timeout 120 python -c "
import jax, jax.numpy as jnp
y = jax.jit(lambda a: a @ a)(jnp.ones((256, 256))); jax.block_until_ready(y)
print('probe ok')" || { echo '{"error": "TPU probe failed"}' | tee -a "$OUT"; exit 1; }
}

gap() { sleep 150; }

: > "$OUT"
probe; gap

run() {  # run <label> <timeout_s> <cmd...>
    local label="$1" to="$2"; shift 2
    echo "== $label" >&2
    # bench deadman must fire BEFORE the outer timeout so a mid-run device
    # stall still produces a structured JSON line (ADVICE r3); floor at
    # 120 s so a short-timeout job never gets a non-positive deadman
    # (threading.Event.wait(<=0) returns immediately -> instant os._exit)
    local dm=$((to - 120)); [ "$dm" -lt 120 ] && dm=120
    ICM_BENCH_DEADMAN_S=$dm \
        timeout "$to" "$@" 2>/dev/null | tail -1 | tee -a "$OUT"
    gap
}

run bench_max           600 python bench.py
run bench_default       600 python bench.py --passes 2 --gn-iters 8
run bench_palomar_max   600 python bench.py --dataset palomar
run bench_palomar_def   600 python bench.py --dataset palomar --passes 2 --gn-iters 8
run bench_ultra_1p2g    600 python bench.py --profile ultra --no-palomar
run bench_fast_1p6g     600 python bench.py --profile fast --no-palomar
run attribution         1200 python benchmarks/attribution.py
run stress              900 python benchmarks/stress_long.py
run bench_fused_ab      600 python bench.py --pallas-fused
# Fleet scaling: the fast-profile curve is the cross-round baseline
# (rounds 1-3 protocol); fleet_curve_max measures the same knee at the
# current bench default (`max`, 1p1g — docs/RESULTS.md LM-depth frontier).
run fleet_curve         1800 python benchmarks/fleet_curve.py
run fleet_curve_max     1200 python benchmarks/fleet_curve.py --profile max --ws 1,4,8,16,32
run bench_turbo_1p3g    600 python bench.py --gn-iters 3
run bench_jacobi        600 python bench.py --jacobi --no-palomar
run bench_jacobi_turbo  600 python bench.py --jacobi --gn-iters 3 --no-palomar
run online              900 python benchmarks/online_eval.py
run roofline            900 python benchmarks/roofline.py --measure

echo "== results in $OUT" >&2
