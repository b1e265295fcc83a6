import time, numpy as np, jax, jax.numpy as jnp
# big compute to queue
M = jnp.ones((4096, 4096), jnp.bfloat16)
f = jax.jit(lambda a: jnp.tanh(a @ a) @ a @ a @ a)
o = f(M); jax.block_until_ready(o)
x = np.ones((16, 28800, 3), np.float32)
# 1) transfer with idle device
t0=time.perf_counter(); d = jnp.asarray(x); t1=time.perf_counter()
print("transfer idle device: %.1f ms" % ((t1-t0)*1e3))
# 2) queue compute, then transfer immediately
o = f(M)
t0=time.perf_counter(); d = jnp.asarray(x); t1=time.perf_counter()
jax.block_until_ready(o)
print("transfer with queued compute: %.1f ms" % ((t1-t0)*1e3))
# 3) how long is the compute alone
o = f(M); jax.block_until_ready(o)
t0=time.perf_counter(); o = f(M); jax.block_until_ready(o)
print("compute alone: %.1f ms" % ((time.perf_counter()-t0)*1e3))
