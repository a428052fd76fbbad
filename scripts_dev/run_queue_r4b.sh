#!/bin/bash
# Round-4 follow-up queue: runs AFTER run_queue_r4.sh drains (waits on its
# PID). Retrains the depth flagship with the decay mitigations (recency-
# stratified replay, lambda-tied entropy anneal, LR decay — see
# configs/sac_full_flagship.yaml) that the r4 v1 run motivated
# (sr 0.77 -> 0.35 collapse at lambda=0.875), then rebuilds the
# sched_parity artifact from the better policy and collects the fused-
# solver cycle attribution for the round's perf work.
#
# Usage: nohup bash scripts_dev/run_queue_r4b.sh > /dev/null 2>&1 & echo $! > /tmp/queue_b.pid
# Progress: tail -f /tmp/queue_b.log
cd /root/repo || exit 1
LOG=/tmp/queue_b.log
say() { echo "[queue-b $(date +%H:%M:%S)] $*" >> "$LOG"; }

# Wait for the main r4 queue to finish: its completion marker in the log,
# or no live process running the script (exact-args match — /tmp/queue.pid
# has been observed holding the launcher shell's PID instead of the
# script's, and pattern kills/waits are forbidden).
main_alive() {
  ps -eo args | awk '$1=="bash" && $2=="scripts_dev/run_queue_r4.sh"' | grep -q .
}
say "waiting for main queue"
while ! grep -q "queue r4 complete" /tmp/queue.log 2>/dev/null && main_alive; do
  sleep 60
done
say "main queue done — starting follow-ups"

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
    echo "$pid" > /tmp/queue_b_job.pid
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
  [ -f "out/$name/QUEUE_DONE" ] || return 0
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

say "=== queue r4b start ==="

# 1. Depth flagship v2 with the decay mitigations.
train_job sac_full_flagship_r4b configs/sac_full_flagship.yaml
eval_job sac_full_flagship_r4b

# 2. sched_parity from the better policy: re-eval the r4b flagship (trained
# under dt80it4pad6) under the reference-mirroring code-default schedule.
if [ -d out/sac_full_flagship_r4b/best_model ]; then
  wait_tpu
  say "sched_parity_v2: r4b policy under the reference-mirroring schedule"
  rm -rf out/sched_parity_v2
  mkdir -p out/sched_parity_v2
  cp -r out/sac_full_flagship_r4b/logs out/sched_parity_v2/logs
  cp -r out/sac_full_flagship_r4b/best_model out/sched_parity_v2/best_model
  python - <<'EOF'
import yaml
cfg = yaml.safe_load(open("out/sac_full_flagship_r4b/config.yaml"))
tpu = cfg.setdefault("tpu", {})
for k in ("dt", "gripper_substeps", "move_substeps",
          "solver_iterations", "pad_inner_iterations"):
    tpu.pop(k, None)
yaml.safe_dump(cfg, open("out/sched_parity_v2/config.yaml", "w"))
print("sched_parity_v2 config written (reference-mirroring code defaults)")
EOF
  timeout 3600 python -m deep_rl_grasping_tpu.training.train run \
    --model out/sched_parity_v2 --best > out/sched_parity_v2/protocol_val.log 2>&1
  say "sched_parity_v2 val: $(grep -Ei 'success' out/sched_parity_v2/protocol_val.log | tail -1)"
  timeout 3600 python -m deep_rl_grasping_tpu.training.train run \
    --model out/sched_parity_v2 --best -t > out/sched_parity_v2/protocol_test.log 2>&1
  say "sched_parity_v2 test: $(grep -Ei 'success' out/sched_parity_v2/protocol_test.log | tail -1)"
fi

# 3. Fused-solver cycle attribution (perf work input: where do the next
# octaves live?).
if [ ! -s out/kernel_breakdown_r4.log ]; then
  wait_tpu
  say "kernel cycle attribution"
  timeout 3600 python scripts_dev/kernel_breakdown.py > out/kernel_breakdown_r4.log 2>&1
  say "kernel breakdown: $(tail -3 out/kernel_breakdown_r4.log | tr '\n' ' ')"
fi

# 4. Bench probe (driver runs the official one at round end; this records
# an interim datapoint after the round's kernel work).
wait_tpu
say "bench probe"
timeout 3600 python bench.py > out/bench_probe_r4.json 2>&1
say "bench: $(tail -1 out/bench_probe_r4.json)"

say "=== queue r4b complete ==="
