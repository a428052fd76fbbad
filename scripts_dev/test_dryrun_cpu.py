import os, sys
sys.path.insert(0, '/root/repo')
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
from deep_rl_grasping_tpu.utils import jax_cache
jax_cache.setup()  # CPU runs get a host-fingerprinted cache dir
import __graft_entry__ as ge
fn, args = ge.entry()
out = jax.jit(fn)(*args)
print('entry ok', out.shape)
ge.dryrun_multichip(8)
print('dryrun 8-device ok')
