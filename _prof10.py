import time, numpy as np, jax, jax.numpy as jnp
x16 = np.ones((16, 28800, 3), np.float32)   # 5.5 MB
x32 = np.ones((32, 28800, 3), np.float32)   # 11 MB
for x, nm in ((x16, "5.5MB"), (x32, "11MB")):
    jax.block_until_ready(jnp.asarray(x))
    t0 = time.perf_counter(); o = jnp.asarray(x); t1 = time.perf_counter()
    jax.block_until_ready(o); t2 = time.perf_counter()
    print("%s: call %.1f ms, drain %.1f ms" % (nm, (t1-t0)*1e3, (t2-t1)*1e3))
# dispatch round-trip latency: tiny dependent op chain, one block at end
f = jax.jit(lambda a: a + 1.0)
a = jnp.zeros((8, 128)); a = f(a); jax.block_until_ready(a)
t0 = time.perf_counter()
for _ in range(20): a = f(a)
jax.block_until_ready(a)
print("tiny dependent jit chain: %.2f ms/op" % ((time.perf_counter()-t0)/20*1e3))
# independent (queued) ops
t0 = time.perf_counter()
outs = [f(jnp.zeros((8,128))) for _ in range(20)]
jax.block_until_ready(outs)
print("tiny independent ops: %.2f ms/op" % ((time.perf_counter()-t0)/20*1e3))
