import time, os, sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

impl = os.environ.get("DLKA_DEFORM_IMPL", "window")
from deformablelka_tpu.models.dlka_former import dlka_former_synapse
model = dlka_former_synapse(num_classes=14, do_ds=False)
x = jnp.zeros((1, 64, 128, 128, 1), jnp.bfloat16)
t0 = time.time()
v = jax.jit(model.init)(jax.random.PRNGKey(0), x)
fwd = jax.jit(lambda v, x: model.apply(v, x))
out = fwd(v, x); _ = np.asarray(out)
tc = time.time() - t0
t0 = time.time()
for _ in range(5):
    out = fwd(v, x)
_ = np.asarray(out)
print(f"impl={impl}: compile+warm {tc:.1f}s, {(time.time()-t0)/5*1000:.0f} ms/fwd", flush=True)
