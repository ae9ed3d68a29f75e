import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
t00=time.time()
from videotuna_tpu.models.opensora.stdit import STDiT
def log(s): print(f"[{time.time()-t00:6.1f}s] {s}", flush=True)
log("start")
model = STDiT(input_size=(16,32,32), in_channels=4, hidden_size=1152, depth=28,
              num_heads=16, caption_channels=4096, pred_sigma=True,
              dtype=jnp.bfloat16, scan_blocks=True)
xs = jnp.zeros((1,2,8,8,4)); ts=jnp.zeros((1,),jnp.int32); ys=jnp.zeros((1,8,4096)); ms=jnp.ones((1,8),bool)
params = jax.jit(model.init)(jax.random.key(0), xs, ts, ys, ms)["params"]
jax.block_until_ready(params); log("init")
params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
x = jnp.zeros((2,16,32,32,4)); t=jnp.zeros((2,),jnp.int32); y=jnp.zeros((2,120,4096)); m=jnp.ones((2,120),bool)
fwd = jax.jit(lambda x: jnp.sum(model.apply({"params":params},x,t,y,m).astype(jnp.float32)))
v=float(fwd(x)); log(f"fwd compile+run {v}")
t0=time.time()
vals=[float(fwd(x)) for _ in range(10)]
log(f"10 runs {time.time()-t0:.2f}s -> {10/(time.time()-t0):.2f} steps/s")
