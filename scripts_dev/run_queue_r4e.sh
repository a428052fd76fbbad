#!/bin/bash
# Round-4 fifth-wave queue: runs AFTER run_queue_r4d.sh drains.
# DQN rerun with the reference's SB2-default exploration schedule
# (fraction 0.1, final eps 0.02): the r4 run's final eps of 0.1 kept the
# curriculum window's stochastic success rate under the 0.7 threshold, so
# lambda never ramped and the protocol (lambda=1) scored 0.61 vs the
# reference DQN_4pads' 71.7%.
#
# Usage: nohup bash scripts_dev/run_queue_r4e.sh > /dev/null 2>&1 & echo $! > /tmp/queue_e.pid
# Progress: tail -f /tmp/queue_d.log
cd /root/repo || exit 1
LOG=/tmp/queue_e.log
say() { echo "[queue-e $(date +%H:%M:%S)] $*" >> "$LOG"; }

prev_alive() {
  ps -eo args | awk '$1=="bash" && $2=="scripts_dev/run_queue_r4d.sh"' | grep -q .
}
say "waiting for queue r4d"
while ! grep -q "queue r4d complete" /tmp/queue_d.log 2>/dev/null && prev_alive; do
  sleep 60
done
say "queue r4d done — starting fifth wave"

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
    echo "$pid" > /tmp/queue_e_job.pid
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

say "=== queue r4e start ==="

train_job dqn_simplified_r4b configs/dqn_simplified.yaml DQN
eval_job dqn_simplified_r4b

say "=== queue r4e complete ==="
