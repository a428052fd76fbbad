#!/bin/bash
# Round-4 third-wave queue: runs AFTER run_queue_r4b.sh drains.
#   1. dt40 physics-schedule sweep rungs (expert-gated; VERDICT r4 perf)
#   2. Single-chip anchor for the sharded-quality comparison (VERDICT #9)
#   3. Encoder-latent flagship retrain under the decay mitigations
#      (lambda-tied entropy anneal, recency replay, LR decay) — the r4
#      run reached protocol 0.57/0.58; the depth flagship's collapse
#      diagnosis applies to its curve too (sr 0.85 @330k -> 0.70 @1M).
# plus 100-episode protocol evals.
#
# Usage: nohup bash scripts_dev/run_queue_r4c.sh > /dev/null 2>&1 & echo $! > /tmp/queue_c.pid
# Progress: tail -f /tmp/queue_c.log
cd /root/repo || exit 1
LOG=/tmp/queue_c.log
say() { echo "[queue-c $(date +%H:%M:%S)] $*" >> "$LOG"; }

prev_alive() {
  ps -eo args | awk '$1=="bash" && $2=="scripts_dev/run_queue_r4b.sh"' | grep -q .
}
say "waiting for queue r4b"
while ! grep -q "queue r4b complete" /tmp/queue_b.log 2>/dev/null && prev_alive; do
  sleep 60
done
say "queue r4b done — starting third wave"

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
    echo "$pid" > /tmp/queue_c_job.pid
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

say "=== queue r4c start ==="

# 1. dt40 sweep rungs (quick; expert fidelity gate at lambda 0 and 1).
if [ ! -s out/physics_sweep_dt40.log ]; then
  wait_tpu
  say "dt40 schedule sweep"
  timeout 5400 python scripts_dev/physics_cost_sweep.py --only dt40 \
    > out/physics_sweep_dt40.log 2>&1
  say "dt40 sweep: $(tail -4 out/physics_sweep_dt40.log | tr '\n' ' ')"
fi

# 2. Single-chip anchor for the sharded-quality claim.
train_job sac_singlechip_quality configs/sac_simplified_singlechip_quality.yaml
eval_job sac_singlechip_quality

# 3. Encoder-latent flagship under the decay mitigations.
train_job sac_encoder_flagship_r4b configs/sac_encoder_flagship.yaml
eval_job sac_encoder_flagship_r4b

say "=== queue r4c complete ==="
