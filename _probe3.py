import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from deformablelka_tpu.models.dlka_former import dlka_former_synapse

for block in ["TransformerBlock_3D_single_deform_LKA",
              "TransformerBlock_3D_LKA",
              "TransformerBlock"]:
    model = dlka_former_synapse(num_classes=14, do_ds=False, trans_block=block)
    x = jnp.zeros((1, 64, 128, 128, 1), jnp.bfloat16)
    t0 = time.time()
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    out = fwd(v, x); _ = np.asarray(out)   # host fetch = true sync
    t_compile = time.time() - t0
    t0 = time.time()
    for _ in range(5):
        out = fwd(v, x)
    _ = np.asarray(out)
    dt = (time.time() - t0) / 5
    print(f"{block}: compile+warm {t_compile:.1f}s, {dt*1000:.1f} ms/fwd", flush=True)
