import time
import numpy as np
import jax
import jax.numpy as jnp

from mvpnet_tpu.ops.pallas import knn as pknn, knn_bucketed as pgated


def timed(name, f, *args, iters=5):
    out = f(*args)
    _ = jax.tree.map(np.asarray, out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _ = jax.tree.map(np.asarray, out)
    print(f"{name}: {(time.perf_counter() - t0) / iters * 1e3:.1f} ms", flush=True)
    return out


rng = np.random.default_rng(0)

# fusion scale: B4 8192 x 96k, surface-like refs (planes = worst case for AABB)
def surface(n, b):
    planes = []
    per = n // 6
    for i in range(6):
        p = rng.uniform(-3, 3, (per, 3)).astype(np.float32)
        p[:, i % 3] = (-3 if i < 3 else 3) + rng.normal(0, 0.01, per)
        planes.append(p)
    rest = rng.uniform(-3, 3, (n - 6 * per, 3)).astype(np.float32)
    one = np.concatenate(planes + [rest])
    return np.stack([rng.permutation(one) for _ in range(b)])


q = jnp.asarray(rng.uniform(-3, 3, (4, 8192, 3)).astype(np.float32))
r = jnp.asarray(surface(5 * 120 * 160, 4))
d_b, i_b = timed("fusion brute  ", jax.jit(lambda q, r: pknn.knn(q, r, 3)), q, r)
d_g, i_g = timed("fusion gated  ", jax.jit(lambda q, r: pgated.knn(q, r, 3)), q, r)
same = np.mean(np.sort(np.asarray(i_b), -1) == np.sort(np.asarray(i_g), -1))
print("fusion parity:", same, "max d err:", np.abs(np.asarray(d_b) - np.asarray(d_g)).max())

# config #4: 102k x 1.23M
q4 = jnp.asarray(rng.uniform(-3, 3, (1, 102400, 3)).astype(np.float32))
r4 = jnp.asarray(surface(64 * 120 * 160, 1))
timed("cfg4 gated    ", jax.jit(lambda q, r: pgated.knn(q, r, 3)), q4, r4, iters=2)
