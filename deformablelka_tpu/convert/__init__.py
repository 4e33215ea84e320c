from deformablelka_tpu.convert.torch_loader import (
    load_torch_state_dict,
    convert_tensor,
    convert_dlka_former,
    convert_maxvit_dlka,
)
