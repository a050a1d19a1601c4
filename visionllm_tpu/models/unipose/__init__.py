from visionllm_tpu.models.unipose.model import UniPose
