"""Split JointARCodec._analysis_q time: input upload vs program vs result download."""
import time
import jax, jax.numpy as jnp, numpy as np

from neural_image_compression_tpu.models import JointAutoregressiveHierarchical
from neural_image_compression_tpu.coding.codec import JointARCodec

model = JointAutoregressiveHierarchical(latent_channels=128, K=3, dtype=jnp.bfloat16)
key = jax.random.PRNGKey(0)
x = np.asarray(jax.random.uniform(key, (1, 512, 768, 3), jnp.float32))
params = jax.jit(lambda k, x: model.init({"params": k, "noise": k}, x,
                 training=False))(key, jnp.asarray(x))["params"]
codec = JointARCodec(model, {"params": params})

def t(fn, iters=10, label=""):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:44s} {dt*1e3:8.1f} ms", flush=True)
    return dt

# upload alone (barrier via scalar fetch)
t(lambda: float(jnp.sum(jax.device_put(jnp.asarray(x)))), label="device_put f32 4.7MB + sum barrier")
x8 = (x * 255).astype(np.uint8)
t(lambda: float(jnp.sum(jax.device_put(jnp.asarray(x8)).astype(jnp.float32))), label="device_put uint8 1.2MB + sum barrier")

# analysis with upload vs pre-staged input
v = {"params": params}
def full():
    yq, zq = codec._analysis_q(v, jnp.asarray(x))
    np.asarray(yq); np.asarray(zq)
t(full, label="_analysis_q with host upload (current)")

xd = jax.device_put(jnp.asarray(x)); float(jnp.sum(xd))
def staged():
    yq, zq = codec._analysis_q(v, xd)
    np.asarray(yq); np.asarray(zq)
t(staged, label="_analysis_q pre-staged input")

# uint8-ingest program: convert on device
a8 = jax.jit(lambda vv, u8: codec._analysis_q.__wrapped__(vv, u8.astype(jnp.float32) / 255.0)) if hasattr(codec._analysis_q, "__wrapped__") else None
mdl = model
a8 = jax.jit(lambda vv, u8: mdl.apply(vv, u8.astype(jnp.float32) / 255.0,
    method=lambda m, xx: (lambda y: (jnp.round(y.astype(jnp.float32)),
                                     jnp.round(m.hyper_encoder(y).astype(jnp.float32))))(m.encoder(xx))))
def u8path():
    yq, zq = a8(v, jnp.asarray(x8))
    np.asarray(yq); np.asarray(zq)
t(u8path, label="_analysis_q uint8 ingest (u8/255 on device)")

# result download share: same program, scalar return
asc = jax.jit(lambda vv, xx: jax.tree.map(jnp.sum, mdl.apply(vv, xx,
    method=lambda m, xx: (lambda y: (jnp.round(y.astype(jnp.float32)),
                                     jnp.round(m.hyper_encoder(y).astype(jnp.float32))))(m.encoder(xx)))))
def scalar_ret():
    r = asc(v, xd)
    float(r[0]); float(r[1])
t(scalar_ret, label="analysis scalar-return, pre-staged (compute only)")
