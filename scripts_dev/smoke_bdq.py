"""CPU smoke of the full BDQ training path (configs/bdq_simplified.yaml
shrunk): Trainer init with encoder obs + branched actions + prioritized
replay, scripted-expert demo seeding, a few train steps, and an eval call —
so the real TPU launch can't die on a Python-level bug."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
from deep_rl_grasping_tpu.utils import jax_cache
jax_cache.setup()  # CPU runs get a host-fingerprinted cache dir
import faulthandler; faulthandler.dump_traceback_later(600, repeat=True)

from deep_rl_grasping_tpu.utils import config as cfg_util

cfg = cfg_util.load_config("configs/bdq_simplified.yaml")
cfg["tpu"].update(num_envs=4, demo_frames=64, updates_per_step=2,
                  spheres_per_object=8, eval_freq=10**9,
                  checkpoint_freq=10**9, chunk_steps=1)
cfg["BDQ"].update(buffer_size=2048, batch_size=16, learning_starts=8,
                  total_timesteps=512)

from deep_rl_grasping_tpu.training.trainer import Trainer

t0 = time.time()
tr = Trainer(cfg, algo="BDQ")
print("trainer built", time.time() - t0, flush=True)
t0 = time.time()
state = jax.jit(tr.init_state)(jax.random.PRNGKey(0))
print("init_state ok", time.time() - t0, flush=True)

t0 = time.time()
state, n_done, n_succ = tr.seed_demos(state, cfg["tpu"]["demo_frames"])
print("seed_demos ok", time.time() - t0, "episodes", float(n_done),
      "successes", float(n_succ), flush=True)

step = jax.jit(tr.train_step)
for i in range(3):
    t0 = time.time()
    state, metrics = step(state)
    jax.block_until_ready(metrics)
    print(f"step {i} ok", round(time.time() - t0, 1),
          {k: round(float(v), 4) for k, v in metrics.items()}, flush=True)

t0 = time.time()
res = tr.evaluate(state.algo_state, state.normalizer, n_episodes=2)
print("evaluate ok", time.time() - t0,
      {k: float(v) for k, v in res.items()}, flush=True)
print("SMOKE PASS", flush=True)
