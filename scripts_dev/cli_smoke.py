import os, sys
sys.path.insert(0, '/root/repo')
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_grasp_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from deep_rl_grasping_tpu.training import train as T
from deep_rl_grasping_tpu.utils import io_utils
import yaml, copy
cfg = io_utils.load_yaml('tests/configs/test_simplified_cont.yaml')
cfg['tpu'] = {'num_envs': 4, 'max_objects': 5, 'spheres_per_object': 8,
              'eval_freq': 64, 'checkpoint_freq': 64, 'chunk_steps': 4}
cfg['SAC'] = {'batch_size': 8, 'buffer_size': 256, 'step_size': 3e-4,
              'layers': [16,16], 'total_timesteps': 128}
cfg['normalize'] = True
io_utils.save_yaml(cfg, '/tmp/claude-0/cli_cfg.yaml')
import shutil
shutil.rmtree('/tmp/claude-0/cli_out', ignore_errors=True)
T.main(['train', '--config', '/tmp/claude-0/cli_cfg.yaml', '--algo', 'SAC',
        '--model_dir', '/tmp/claude-0/cli_out'])
print('--- run ---')
T.main(['run', '--model', '/tmp/claude-0/cli_out', '--episodes', '4'])
