import time, functools
import numpy as np, jax, jax.numpy as jnp
from flax import nnx
from mvpnet_tpu.config import Config
from mvpnet_tpu.models import build_model
from mvpnet_tpu.train.step import prepare_batch
from __graft_entry__ import _example_batch

B,N,V,H,W = 4,8192,5,120,160
cfg = Config()
model,_,_ = build_model(cfg, rngs=nnx.Rngs(0))
model.eval()
graphdef, state = nnx.split(model)
rng = np.random.default_rng(0)
batch = jax.device_put(_example_batch(rng,B=B,N=N,V=V,H=H,W=W))

def timeit(f, *a, iters=10):
    o = f(*a); _ = np.asarray(jax.tree_util.tree_leaves(o)[0])
    t0=time.perf_counter()
    for _ in range(iters): o = f(*a)
    _ = np.asarray(jax.tree_util.tree_leaves(o)[0])
    return (time.perf_counter()-t0)/iters*1e3

@jax.jit
def full(state, batch):
    m = nnx.merge(graphdef, state)
    return m(prepare_batch(cfg, batch, training=False))[0]
print("full forward: %.1f ms" % timeit(full, state, batch), flush=True)

prep = jax.jit(lambda b: prepare_batch(cfg, b, training=False))
mb = jax.device_put(jax.tree.map(np.asarray, prep(batch)))
print("prepare_batch: %.1f ms" % timeit(prep, batch), flush=True)

@jax.jit
def unet_only(state, images):
    m = nnx.merge(graphdef, state)
    f, l = m.net_2d(images.reshape(B*V,H,W,3))
    return f
print("unet: %.1f ms" % timeit(unet_only, state, mb["images"]), flush=True)

from mvpnet_tpu import ops
pts = mb["points"]; pxyz = mb["image_xyz"].reshape(B, V*H*W, 3)
print("fusion knn: %.1f ms" % timeit(jax.jit(functools.partial(ops.knn, k=3)), pts, pxyz), flush=True)

@jax.jit
def pn2_only(state, points, fused):
    m = nnx.merge(graphdef, state)
    return m.net_3d(points, fused)
fused = jnp.zeros((B,N,64), jnp.float32)
print("pn2ssg: %.1f ms" % timeit(pn2_only, state, pts, fused), flush=True)
