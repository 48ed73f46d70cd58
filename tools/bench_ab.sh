#!/bin/bash
# Bench A/B matrix (TPU_WORKQUEUE.md §1). Serial: one TPU client at a
# time, nothing else on the host. Results appended as JSON lines with
# the config tag to $OUT.
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/bench_ab.jsonl}
: > "$OUT"

run() {
    local tag="$1"; shift
    echo "=== $tag ($(date +%H:%M:%S))" >&2
    local line
    line=$(env "$@" timeout 1600 python bench.py 2>/tmp/bench_ab_err.log)
    local rc=$?
    if [ $rc -ne 0 ] || [ -z "$line" ]; then
        echo "{\"tag\": \"$tag\", \"error\": \"rc=$rc\"}" >> "$OUT"
        tail -3 /tmp/bench_ab_err.log >&2
        # after a TPU fault the device is wedged ~3-5 min
        sleep 180
    else
        echo "{\"tag\": \"$tag\", \"bench\": $line}" >> "$OUT"
    fi
}

run iters15                 QTPU_SOLVER_ITERS=15
run iters8                  QTPU_SOLVER_ITERS=8
run iters8_pools            QTPU_SOLVER_ITERS=8 QTPU_POOLS=8,28,12
run iters8_fk               QTPU_SOLVER_ITERS=8 QTPU_FK_BLAST=1
run iters8_fk_smooth        QTPU_SOLVER_ITERS=8 QTPU_FK_BLAST=1 QTPU_SMOOTH_BLAST=1
run iters8_fk_smooth_asm    QTPU_SOLVER_ITERS=8 QTPU_FK_BLAST=1 QTPU_SMOOTH_BLAST=1 QTPU_ASM_BLAST=1
run iters8_pools_allblast   QTPU_SOLVER_ITERS=8 QTPU_POOLS=8,28,12 QTPU_FK_BLAST=1 QTPU_SMOOTH_BLAST=1 QTPU_ASM_BLAST=1
echo "=== matrix done ($(date +%H:%M:%S))" >&2
cat "$OUT"
