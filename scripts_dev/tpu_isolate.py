import os, sys, time
sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_grasp_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from deep_rl_grasping_tpu.training.trainer import Trainer
from deep_rl_grasping_tpu.utils import config as cfg_util

cfg = cfg_util.load_config('configs/sac_simplified_demo.yaml')
tr = Trainer(cfg, algo='SAC')
print('stage: init_state', flush=True)
t0=time.time()
state = jax.jit(tr.init_state)(jax.random.PRNGKey(0))
jax.block_until_ready(state.obs)
print('init ok', time.time()-t0, flush=True)
print('stage: train_step', flush=True)
t0=time.time()
step = jax.jit(tr.train_step)
state, metrics = step(state)
jax.block_until_ready(metrics['critic_loss'])
print('train_step ok', time.time()-t0, {k: float(v) for k,v in metrics.items()}, flush=True)
t0=time.time()
for i in range(5):
    state, metrics = step(state)
jax.block_until_ready(metrics['critic_loss'])
print('5 steps', time.time()-t0, flush=True)
