import os, sys
sys.path.insert(0, '/root/repo')
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_grasp_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import __graft_entry__ as ge
fn, args = ge.entry()
out = jax.jit(fn)(*args)
print('entry ok', out.shape)
ge.dryrun_multichip(8)
print('dryrun 8-device ok')
