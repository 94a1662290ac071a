import time
import numpy as np, jax, jax.numpy as jnp

@jax.jit
def tiny(x): return x + 1.0
x = jax.device_put(jnp.ones((8,8)))
_ = np.asarray(tiny(x))
for iters in (10, 50):
    t0=time.perf_counter()
    for _ in range(iters): o = tiny(x)
    _ = np.asarray(o)
    print("tiny dispatch x%d: %.2f ms/call" % (iters, (time.perf_counter()-t0)/iters*1e3), flush=True)

# big matmul to sanity-check compute timing
a = jax.device_put(jnp.ones((8192, 8192), jnp.bfloat16))
mm = jax.jit(lambda a: a @ a)
_ = np.asarray(mm(a))[0,0]
t0=time.perf_counter()
for _ in range(20): o = mm(o if False else a)
_ = np.asarray(o)[0,0]
dt=(time.perf_counter()-t0)/20
print("8k bf16 matmul: %.2f ms -> %.1f TFLOP/s" % (dt*1e3, 2*8192**3/dt/1e12), flush=True)
