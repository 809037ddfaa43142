import time, jax, jax.numpy as jnp
t0=time.perf_counter()
from cremage_tpu.models.unet import UNetModel, sd15_unet_config
model = UNetModel(sd15_unet_config())
x = jnp.zeros((1,64,64,4), jnp.bfloat16); t=jnp.zeros((1,),jnp.float32); ctx=jnp.zeros((1,77,768), jnp.bfloat16)
print("imports", time.perf_counter()-t0, flush=True)
t0=time.perf_counter()
params = jax.jit(model.init)(jax.random.key(0), x, t, ctx)
jax.block_until_ready(params)
print("init", time.perf_counter()-t0, flush=True)
fwd = jax.jit(model.apply)
t0=time.perf_counter()
out = fwd(params, x, t, ctx); out.block_until_ready()
print("first fwd (compile)", time.perf_counter()-t0, flush=True)
t0=time.perf_counter()
for _ in range(5):
    out = fwd(params, x, t, ctx)
out.block_until_ready()
print("5 fwd", time.perf_counter()-t0, flush=True)
# batch 4 with CFG-style batch 8
x8 = jnp.zeros((8,64,64,4), jnp.bfloat16); t8=jnp.zeros((8,),jnp.float32); ctx8=jnp.zeros((8,77,768), jnp.bfloat16)
t0=time.perf_counter()
out = fwd(params, x8, t8, ctx8); out.block_until_ready()
print("batch8 fwd (compile)", time.perf_counter()-t0, flush=True)
t0=time.perf_counter()
for _ in range(5):
    out = fwd(params, x8, t8, ctx8)
out.block_until_ready()
print("5x batch8 fwd", time.perf_counter()-t0, flush=True)
