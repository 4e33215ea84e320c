from deformablelka_tpu.inference.sliding_window import (
    compute_steps,
    gaussian_importance_map,
    SlidingWindowInference,
)
