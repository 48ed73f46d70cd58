#!/bin/bash
# Autonomous TPU-recovery orchestrator (round 2 work queue, TPU_WORKQUEUE.md).
#
# The axon tunnel dies for hours at a time; this script waits for it to
# come back and then immediately executes the queued on-chip work:
#   1. bench A/B matrix (solver iters / condim pools / batch-last flags),
#      each invocation bounded, results appended to /tmp/bench_ab.log
#   2. launches the flagship walking-gait training run (supervised,
#      stall-tolerant) with the winning physics config
#
# Run detached:  nohup bash tools/tpu_orchestrator.sh > /tmp/orch.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

PING_LOG=/tmp/tpu_ping_last.log
AB_LOG=/tmp/bench_ab.log

echo "[orch] $(date) waiting for TPU tunnel"
while true; do
  if timeout 180 python tools/tpu_ping.py > "$PING_LOG" 2>&1 && grep -q result: "$PING_LOG"; then
    echo "[orch] $(date) TPU alive"
    date > /tmp/tpu_alive
    break
  fi
  echo "[orch] $(date) tunnel still dead"
  sleep 420
done

run_bench () {  # run_bench <tag> [ENV=V ...]
  local tag=$1; shift
  echo "=== $tag ($*)" >> "$AB_LOG"
  # bench's internal watchdog (QTPU_BENCH_DEADLINE) exits cleanly before
  # the outer timeout can SIGTERM a client with in-flight programs (the
  # known tunnel-wedge cause); the outer timeout is only a backstop.
  local out
  out=$(env QTPU_SOLVER_ITERS=8 QTPU_BENCH_DEADLINE=800 "$@" \
        timeout 1000 python bench.py 2>/tmp/bench_err_$tag.log)
  local rc=$?
  echo "$out" >> "$AB_LOG"
  if [ $rc -ne 0 ]; then
    echo "rc=$rc (see /tmp/bench_err_$tag.log tail:)" >> "$AB_LOG"
    tail -3 /tmp/bench_err_$tag.log >> "$AB_LOG"
    echo ""
    return 1
  fi
  # last line is the JSON; extract value
  echo "$out" | tail -1 | python -c 'import sys,json;print(json.loads(sys.stdin.read())["value"])' 2>/dev/null
}

declare -A VAL
echo "[orch] $(date) bench A/B matrix start" | tee -a "$AB_LOG"
VAL[base15]=$(run_bench base15 QTPU_SOLVER_ITERS=15)
VAL[it8]=$(run_bench it8)
VAL[pools]=$(run_bench pools QTPU_POOLS=8,28,12)
VAL[fk]=$(run_bench fk QTPU_POOLS=8,28,12 QTPU_FK_BLAST=1)
VAL[fksm]=$(run_bench fksm QTPU_POOLS=8,28,12 QTPU_FK_BLAST=1 QTPU_SMOOTH_BLAST=1)
VAL[fksmasm]=$(run_bench fksmasm QTPU_POOLS=8,28,12 QTPU_FK_BLAST=1 QTPU_SMOOTH_BLAST=1 QTPU_ASM_BLAST=1)
echo "[orch] $(date) A/B done:" | tee -a "$AB_LOG"
for k in base15 it8 pools fk fksm fksmasm; do echo "  $k = ${VAL[$k]:-FAIL}"; done | tee -a "$AB_LOG"

# Pick training flags: pools+8it always; add blast flags only if the full
# blast config succeeded AND beats pools by >10%.
TRAIN_ENV=(QTPU_SOLVER_ITERS=8)
best=${VAL[pools]:-${VAL[it8]:-0}}
if [ -n "${VAL[fksmasm]:-}" ] && python -c "import sys;sys.exit(0 if float('${VAL[fksmasm]}') > 1.1*float('${best:-0}') else 1)" 2>/dev/null; then
  TRAIN_ENV+=(QTPU_FK_BLAST=1 QTPU_SMOOTH_BLAST=1 QTPU_ASM_BLAST=1)
  echo "[orch] batch-last flags WIN -> enabled for training"
fi

echo "[orch] $(date) launching flagship walking run"
env "${TRAIN_ENV[@]}" nohup python tools/train_supervisor.py \
    --total_timesteps 100000000 \
    --stall_minutes 12 \
    -- \
    --num_parallel_envs 4096 --n_steps 64 --num_minibatches 8 --n_epochs 5 \
    --ctrl_type torque --reward_profile locomotion \
    --contact_pools 8,28,12 \
    --solver_iterations 8 \
    --eval_frequency 2000000 --video_interval 10000000 \
    --eval_max_time 120 \
    --checkpoint_interval 5000000 \
    --run_name walk-locomotion \
    > /tmp/supervisor_gait.log 2>&1 &
echo $! > /tmp/supervisor_gait.pid
echo "[orch] supervisor pid $(cat /tmp/supervisor_gait.pid)"
