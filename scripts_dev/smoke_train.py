import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
from deep_rl_grasping_tpu.utils import jax_cache
jax_cache.setup()  # CPU runs get a host-fingerprinted cache dir
import faulthandler; faulthandler.dump_traceback_later(240, repeat=True)
import jax.numpy as jnp
from deep_rl_grasping_tpu.utils import config as cfg_util

cfg = cfg_util.load_config('tests/configs/test_continuous.yaml')
cfg['tpu']['num_envs'] = 8
cfg['SAC'] = {'batch_size': 8, 'buffer_size': 512, 'step_size': 3e-4, 'layers': [32, 32]}
cfg['normalize'] = True

print('--- single-device trainer ---', flush=True)
from deep_rl_grasping_tpu.training.trainer import Trainer
t0 = time.time()
tr = Trainer(cfg, algo='SAC', num_envs=4)
state = jax.jit(tr.init_state)(jax.random.PRNGKey(0))
print('init ok', time.time()-t0, flush=True)
t0 = time.time()
step = jax.jit(tr.train_step)
state, metrics = step(state)
jax.block_until_ready(metrics)
print('train_step ok', time.time()-t0, {k: float(v) for k,v in metrics.items()}, flush=True)
t0 = time.time()
state, metrics = step(state)
jax.block_until_ready(metrics)
print('2nd step', time.time()-t0, flush=True)

print('--- sharded trainer (8 virtual devices) ---', flush=True)
from jax.sharding import Mesh
from deep_rl_grasping_tpu.parallel.train_dp import make_sharded_trainer
mesh = Mesh(jax.devices()[:8], axis_names=('env',))
t0=time.time()
tr2, st2, m2 = make_sharded_trainer(cfg, mesh, run_one_step=True)
print('sharded one step ok', time.time()-t0, {k: float(v) for k,v in m2.items()}, flush=True)
