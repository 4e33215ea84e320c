import time, json
t00 = time.time()
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from deformablelka_tpu.models.dlka_former import dlka_former_synapse
from deformablelka_tpu.inference.sliding_window import SlidingWindowInference

model = dlka_former_synapse(num_classes=14, do_ds=False)
patch = (64, 128, 128)
x0 = jnp.zeros((1, *patch, 1), jnp.bfloat16)
variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
print(f"[{time.time()-t00:.1f}s] init", flush=True)

def apply_fn(params, x):
    return model.apply(params, x.astype(jnp.bfloat16))

vol = np.random.RandomState(0).randn(128, 256, 256, 1).astype(np.float32)

sw = SlidingWindowInference(apply_fn, patch_size=patch, num_classes=14,
                            step_size=0.5, do_mirroring=False)
t0 = time.time()
probs = sw.predict(variables, vol)
print(f"[{time.time()-t00:.1f}s] noTTA warm {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
probs = sw.predict(variables, vol)
print(f"[{time.time()-t00:.1f}s] noTTA run {time.time()-t0:.2f}s/vol", flush=True)
