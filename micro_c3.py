import time, jax, jax.numpy as jnp, numpy as np
from speech_enhancement_clskd_tpu.utils.jax_setup import enable_compilation_cache
import speech_enhancement_clskd_tpu.ops.pallas.conv3x3 as pc
enable_compilation_cache()
key = jax.random.PRNGKey(0)
def fence(v): return float(np.asarray(jnp.sum(v.astype(jnp.float32))))
def timeit(f, *args, n=8):
    g = jax.jit(f)
    out = g(*args); fence(out if isinstance(out, jax.Array) else jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n): out = g(*args)
    fence(out if isinstance(out, jax.Array) else jax.tree.leaves(out)[0])
    return (time.perf_counter()-t0)/n
def ref(x, w):
    return jax.lax.conv_general_dilated(x, w, (1,1), ((1,1),(1,1)),
        dimension_numbers=("NHWC","HWIO","NHWC"))
for bd_try in (4, 8, 16):
    for (B,D,T,C,O) in [(32,256,483,64,2),(32,128,483,64,32)]:
        x = jax.random.normal(key,(B,D,T,C),jnp.bfloat16)
        w = jax.random.normal(key,(3,3,C,O),jnp.bfloat16)*0.1
        try:
            yp = jax.jit(lambda x,w: pc.conv3x3_small(x,w,bd_try))(x,w)
            err = float(jnp.max(jnp.abs(yp.astype(jnp.float32)-jax.jit(ref)(x,w).astype(jnp.float32))))
            tp = timeit(lambda x,w: pc.conv3x3_small(x,w,bd_try), x, w)
            dy = jax.random.normal(key,(B,D,T,O),jnp.bfloat16)
            gp = timeit(jax.grad(lambda x,w: jnp.sum((pc.conv3x3_small(x,w,bd_try)*dy).astype(jnp.float32)), argnums=(0,1)), x, w)
            print(f"bd={bd_try} [{D}x{T}x{C}]->{O} err={err:.4f} fwd {tp*1e3:.2f} ms f+b {gp*1e3:.2f} ms", flush=True)
        except Exception as e:
            print(f"bd={bd_try} [{D}]->{O} FAIL {str(e)[:90]}", flush=True)
