from visionllm_tpu.ops.ms_deform_attn import (
    ms_deform_attn,
    ms_deform_attn_reference,
)
from visionllm_tpu.ops import box_ops
