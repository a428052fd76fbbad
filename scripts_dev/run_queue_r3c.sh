#!/bin/bash
# Round-3 session-C chip queue: finish the remaining model families.
#
# Fresh VM (cold /tmp): the sweep/kernel-bench decisions from run_queue.sh
# are already committed into the configs, so this queue only runs what is
# still missing:
#   1. full-task AE dataset + retrain (fixes the sac_encoder_flagship_v1
#      OOD-latent failure, TRAINING_NOTES.md)
#   2. sac_encoder_flagship  (reference SAC_encoder_1mbuffer family)
#   3. sac_rgbd_flagship     (reference SAC_full_rgbd family; restart — the
#      prior attempt died at 40k frames before the first checkpoint)
#   4. dqn_simplified        (reference DQN_4pads family)
#   5. sac_table_clearing    (reference table_clearing family)
# plus the 100-episode protocol evals after each.
#
# Usage: nohup bash scripts_dev/run_queue_r3c.sh > /dev/null 2>&1 & echo $! > /tmp/queue.pid
# Progress: tail -f /tmp/queue.log
cd /root/repo || exit 1
LOG=/tmp/queue.log
say() { echo "[queue $(date +%H:%M:%S)] $*" >> "$LOG"; }

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
    echo "$pid" > /tmp/queue_job.pid
    # Supervise: finished -> break; log static >45 min (tunnel hang; cold
    # compile of the full task is ~20-40 min, so the bar sits above it)
    # -> kill by PID and resume from the last checkpoint.
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
  if [ ! -f "out/$name/protocol_val.log" ]; then
    wait_tpu
    say "eval $name (validation split, best checkpoint)"
    timeout 3600 python -m deep_rl_grasping_tpu.training.train run \
      --model "out/$name" --best > "out/$name/protocol_val.log" 2>&1
    say "eval $name val: $(grep -Ei 'success' "out/$name/protocol_val.log" | tail -1)"
  fi
  if [ ! -f "out/$name/protocol_test.log" ]; then
    wait_tpu
    say "eval $name (test split, best checkpoint)"
    timeout 3600 python -m deep_rl_grasping_tpu.training.train run \
      --model "out/$name" --best -t > "out/$name/protocol_test.log" 2>&1
    say "eval $name test: $(grep -Ei 'success' "out/$name/protocol_test.log" | tail -1)"
  fi
}

say "=== queue r3c start ==="

# 1. Full-task AE pipeline (the v1 failure fix). ~20k mixed-lambda images
# from the flagship env, then the conv AE trained to early stop.
if [ ! -f encoder_files/full/AE_DONE ]; then
  wait_tpu
  say "AE collect (full task, mixed lambda)"
  timeout 5400 python -m deep_rl_grasping_tpu.training.collect_dataset \
    --config configs/sac_full_flagship.yaml --keep_task --mix_lambda \
    --out encoder_files/full_dataset.npz --train 18000 --test 2000 \
    --num_envs 128 >> "$LOG" 2>&1 || say "AE collect FAILED"
  if [ -f encoder_files/full_dataset.npz ]; then
    say "AE train"
    timeout 5400 python -m deep_rl_grasping_tpu.training.train_encoder train \
      --data encoder_files/full_dataset.npz --model_dir encoder_files/full \
      >> "$LOG" 2>&1 && \
    timeout 1200 python -m deep_rl_grasping_tpu.training.train_encoder test \
      --data encoder_files/full_dataset.npz --model_dir encoder_files/full \
      >> "$LOG" 2>&1 && touch encoder_files/full/AE_DONE
    say "AE pipeline done: $(ls encoder_files/full 2>/dev/null | tr '\n' ' ')"
  fi
fi

# 2-5. Remaining model families, most-valuable first.
if [ -f encoder_files/full/AE_DONE ]; then
  train_job sac_encoder_flagship configs/sac_encoder_flagship.yaml
  eval_job sac_encoder_flagship
else
  say "skipping encoder flagship: AE pipeline incomplete"
fi
train_job sac_rgbd_flagship configs/sac_rgbd_flagship.yaml
eval_job sac_rgbd_flagship
train_job dqn_simplified configs/dqn_simplified.yaml DQN
eval_job dqn_simplified
train_job sac_table_clearing configs/sac_table_clearing.yaml
eval_job sac_table_clearing
say "=== queue r3c complete ==="
