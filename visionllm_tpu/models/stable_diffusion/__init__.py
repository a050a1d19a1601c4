from visionllm_tpu.models.stable_diffusion.unet import (UNetConfig,
                                                        UNet2DCondition)
from visionllm_tpu.models.stable_diffusion.vae import (VAEConfig,
                                                       AutoencoderKL)
from visionllm_tpu.models.stable_diffusion.scheduler import (
    DiffusionSchedule, ddim_sample_loop)
from visionllm_tpu.models.stable_diffusion.sd_head import (
    StableDiffusionWithLLMEmb, InstructPix2PixWithLLMEmb, LLM2SDMapper)
from visionllm_tpu.models.stable_diffusion.clip_text import (
    ClipTextConfig, ClipTextModel)
