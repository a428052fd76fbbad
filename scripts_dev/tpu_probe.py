import faulthandler, time, sys
faulthandler.dump_traceback_later(45, repeat=True, file=sys.stderr)
import jax, jax.numpy as jnp
print('import ok', flush=True)
print(jax.devices(), flush=True)
t0=time.time()
y = jax.jit(lambda a: (a@a).sum())(jnp.ones((256,256)))
print('matmul ok', float(y), time.time()-t0, flush=True)
