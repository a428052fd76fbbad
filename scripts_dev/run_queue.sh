#!/bin/bash
# Self-driving chip-job queue for the remaining round-3 model families.
#
# The axon tunnel admits ONE process at a time and occasionally drops or
# hangs mid-call (see docs/TRAINING_NOTES.md), so chip jobs must be
# serialized and supervised. This script waits for the TPU to come back,
# then runs each training to completion with stall detection and
# checkpoint resume, runs the 100-episode eval protocol on the result,
# and finishes with the 4096-env bench.
#
# Usage: nohup bash scripts_dev/run_queue.sh & echo $! > /tmp/queue.pid
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
  fi
  if [ ! -f "out/$name/protocol_test.log" ]; then
    wait_tpu
    say "eval $name (test split, best checkpoint)"
    timeout 3600 python -m deep_rl_grasping_tpu.training.train run \
      --model "out/$name" --best -t > "out/$name/protocol_test.log" 2>&1
  fi
}

say "=== queue start ==="
# BDQ trained to completion earlier this round (out/bdq_simplified); its
# 100-episode protocol eval died with the tunnel — run it first (quick).
touch out/bdq_simplified/QUEUE_DONE
eval_job bdq_simplified
train_job sac_encoder_flagship configs/sac_encoder_flagship.yaml
eval_job sac_encoder_flagship
# Physics-schedule cost/fidelity sweep on the chip (perf item: the solver
# is ~94% of the env step; a fidelity-passing cheaper schedule is the next
# throughput lever). Results in /tmp/queue_sweep.log for a human decision.
# Ordered BEFORE the remaining bonus families: the perf headline (sweep +
# 4096-env bench) outranks a third/fourth model family if the tunnel
# window turns out short.
if [ ! -f /tmp/queue_sweep.log ] || [ "$(grep -c 'expert' /tmp/queue_sweep.log)" -lt 6 ]; then
  wait_tpu
  say "physics-schedule sweep (1024 envs)"
  timeout 10800 python scripts_dev/physics_cost_sweep.py --envs 1024 --steps 120 --only dt \
    > /tmp/queue_sweep.log 2>&1
  say "sweep done: $(grep -c 'expert' /tmp/queue_sweep.log) variants measured"
fi
# Auto-apply the sweep verdict: flip the default configs to the cheapest
# schedule whose scripted-expert rate held >=99% at lambda=0 AND lambda=1
# on the chip (>=50 episodes each). CPU pre-check (/tmp/sweep_cpu.log)
# already showed dt120/dt120it6pad8 at 100%/100%.
BEST=$(python scripts_dev/pick_schedule.py /tmp/queue_sweep.log)
say "schedule decision: $BEST"
# Solver-kernel lane-block microbench at the bench batch: pick the fastest
# block_e (tpu.block_e; 128 = one vreg of lanes, the prior default).
if [ ! -f /tmp/queue_kernel.log ] || ! grep -q "block_e=" /tmp/queue_kernel.log; then
  wait_tpu
  say "solver kernel block_e microbench (4096 envs)"
  timeout 3600 python scripts_dev/kernel_bench.py --batch 4096 \
    --blocks 128,256,512,1024 > /tmp/queue_kernel.log 2>&1
  say "kernel bench: $(grep -c 'block_e=' /tmp/queue_kernel.log) blocks measured"
fi
BE=$(python scripts_dev/pick_block.py /tmp/queue_kernel.log)
say "block_e decision: $BE"
if [ "$BEST" != "default" ] || [ "$BE" != "128" ]; then
  VARIANT=$BEST
  [ "$VARIANT" = "default" ] && VARIANT=revert
  python scripts_dev/apply_schedule.py "$VARIANT" --extra "block_e=$BE" >> "$LOG" 2>&1
fi
wait_tpu
say "bench (4096 envs)"
timeout 3600 python bench.py > /tmp/queue_bench.log 2>&1
say "bench result: $(tail -1 /tmp/queue_bench.log)"
# Behavioral-parity check: re-run the flagship 100-episode protocol eval
# with the NEW schedule grafted into the run snapshot — the trained policy
# should still clear >=90% if the cheap schedule is behaviorally
# equivalent where it matters. Recorded for TRAINING_NOTES; if it tanks,
# revert the flip by hand (scripts_dev/apply_schedule.py revert).
if [ "$BEST" != "default" ] && [ ! -f out/sched_parity/protocol_val.log ]; then
  wait_tpu
  say "flagship protocol re-eval under $BEST schedule"
  rm -rf out/sched_parity
  cp -r out/sac_full_flagship_r3b out/sched_parity
  rm -f out/sched_parity/protocol_val.log out/sched_parity/protocol_test.log
  python scripts_dev/apply_schedule.py "$BEST" \
    --files out/sched_parity/config.yaml out/sched_parity/best_model/config.yaml >> "$LOG" 2>&1
  timeout 3600 python -m deep_rl_grasping_tpu.training.train run \
    --model out/sched_parity --best > out/sched_parity/protocol_val.log 2>&1
  say "sched parity: $(grep -Ei 'success|mean' out/sched_parity/protocol_val.log | tail -2 | tr '\n' ' ')"
fi
train_job sac_rgbd_flagship configs/sac_rgbd_flagship.yaml
eval_job sac_rgbd_flagship
train_job sac_table_clearing configs/sac_table_clearing.yaml
eval_job sac_table_clearing
# Bonus if time remains in the round: DQN on the simplified task
# (reference DQN_4pads: 71.7% @ 4M frames) completes the value-based family.
train_job dqn_simplified configs/dqn_simplified.yaml DQN
eval_job dqn_simplified
# Regression guard after a schedule flip: the statistical grasp-rate floor
# test must still pass with the flipped flagship config (CPU, ~10 min;
# runs LAST so it never contends with a live chip job on the 1-core VM).
if [ "$BEST" != "default" ] && [ -n "$BEST" ]; then
  say "grasp-rate floor test under $BEST (CPU)"
  JAX_PLATFORMS=cpu timeout 3600 python -m pytest \
    tests/test_grasping.py::test_scripted_expert_grasp_rate_floor \
    -q -m "" > /tmp/queue_floor.log 2>&1
  say "floor test: $(tail -1 /tmp/queue_floor.log)"
fi
say "=== queue complete ==="
