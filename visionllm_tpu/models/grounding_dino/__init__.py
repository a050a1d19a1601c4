from visionllm_tpu.models.grounding_dino.model import GroundingDino
