#!/bin/bash
# Dynamic chip queue: drains jobs from scripts_dev/queue_jobs.txt, one per
# line, re-reading the file each cycle — so new jobs can be APPENDED while
# it runs (editing a live bash script is unsafe; editing its job FILE is
# not). Runs after run_queue_r4e.sh drains.
#
# Job syntax (first token is the verb):
#   train <name> <config> [algo]   — train out/<name> with retries+resume
#   eval <name>                    — 100-ep protocol val+test for out/<name>
#   cmd <shell ...>                — one-shot command (marker: its own file)
# Processed jobs are recorded in scripts_dev/queue_jobs.done and skipped on
# re-read; malformed/unknown lines are logged and skipped.
#
# Usage: nohup bash scripts_dev/run_queue_dyn.sh > /dev/null 2>&1 & echo $! > /tmp/queue_dyn.pid
# Progress: tail -f /tmp/queue_dyn.log
cd /root/repo || exit 1
LOG=/tmp/queue_dyn.log
JOBS=scripts_dev/queue_jobs.txt
DONE=scripts_dev/queue_jobs.done
say() { echo "[queue-dyn $(date +%H:%M:%S)] $*" >> "$LOG"; }

prev_alive() {
  ps -eo args | awk '$1=="bash" && $2=="scripts_dev/run_queue_r4e.sh"' | grep -q .
}
say "waiting for queue r4e"
while ! grep -q "queue r4e complete" /tmp/queue_e.log 2>/dev/null && prev_alive; do
  sleep 60
done
say "queue r4e done — draining $JOBS"

wait_tpu() {
  while true; do
    if timeout 150 python -c "import jax; d=jax.devices(); assert d[0].platform != 'cpu', d" >/dev/null 2>&1; then
      say "TPU up"
      return 0
    fi
    say "TPU unreachable; retry in 240s"
    sleep 240
  done
}

train_job() { # name config [algo]
  local name=$1 config=$2 algo=${3:-SAC}
  local dir=out/$name log=out/${name}_train.log
  if [ -f "$dir/QUEUE_DONE" ]; then say "$name already done"; return 0; fi
  local attempt
  for attempt in 1 2 3 4 5 6; do
    wait_tpu
    local resume=""
    if [ -d "$dir/logs" ] && [ -n "$(ls -A "$dir/logs" 2>/dev/null)" ]; then
      resume="--load_dir $dir"
    fi
    say "$name attempt $attempt $resume"
    nohup python -m deep_rl_grasping_tpu.training.train train \
      --config "$config" --algo "$algo" --model_dir "$dir" $resume \
      >> "$log" 2>&1 &
    local pid=$!
    echo "$pid" > /tmp/queue_dyn_job.pid
    while kill -0 "$pid" 2>/dev/null; do
      sleep 120
      local age=$(( $(date +%s) - $(stat -c %Y "$log" 2>/dev/null || date +%s) ))
      if [ "$age" -gt 2700 ]; then
        say "$name stalled (${age}s without log output) — killing pid $pid"
        kill "$pid" 2>/dev/null
        sleep 10
        kill -9 "$pid" 2>/dev/null
        break
      fi
    done
    wait "$pid" 2>/dev/null
    local rc=$?
    if tail -5 "$log" | grep -q "done: "; then
      touch "$dir/QUEUE_DONE"
      say "$name finished (rc=$rc)"
      return 0
    fi
    say "$name ended rc=$rc without completing — retrying"
    sleep 30
  done
  say "$name FAILED after 6 attempts"
  return 1
}

eval_job() { # name
  local name=$1
  [ -f "out/$name/QUEUE_DONE" ] || { say "eval $name skipped (no QUEUE_DONE)"; return 0; }
  if [ ! -s "out/$name/protocol_val.log" ]; then
    wait_tpu
    say "eval $name (validation split, best checkpoint)"
    timeout 3600 python -m deep_rl_grasping_tpu.training.train run \
      --model "out/$name" --best > "out/$name/protocol_val.log" 2>&1
    say "eval $name val: $(grep -Ei 'success' "out/$name/protocol_val.log" | tail -1)"
  fi
  if [ ! -s "out/$name/protocol_test.log" ]; then
    wait_tpu
    say "eval $name (test split, best checkpoint)"
    timeout 3600 python -m deep_rl_grasping_tpu.training.train run \
      --model "out/$name" --best -t > "out/$name/protocol_test.log" 2>&1
    say "eval $name test: $(grep -Ei 'success' "out/$name/protocol_test.log" | tail -1)"
  fi
}

say "=== queue dyn start ==="
touch "$DONE"
while true; do
  # next not-yet-done job line (exact-line match against the done ledger)
  line=$(grep -vxF -f "$DONE" "$JOBS" 2>/dev/null | grep -v '^\s*#' | grep -v '^\s*$' | head -1)
  if [ -z "$line" ]; then
    # idle: keep polling for appended jobs for 2h, then exit
    idle=$(( ${idle:-0} + 1 ))
    if [ "$idle" -gt 120 ]; then say "idle 2h — exiting"; break; fi
    sleep 60
    continue
  fi
  idle=0
  say "job: $line"
  set -- $line
  verb=$1; shift
  case "$verb" in
    train) train_job "$@" ;;
    eval)  eval_job "$@" ;;
    cmd)   wait_tpu; say "cmd: $*"; timeout 7200 bash -c "$*" >> "$LOG" 2>&1 ;;
    *)     say "unknown verb: $verb" ;;
  esac
  echo "$line" >> "$DONE"
done
say "=== queue dyn complete ==="
