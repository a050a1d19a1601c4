from visionllm_tpu.data import det_dataset as _det  # registry side effects
from visionllm_tpu.data import llava_dataset as _llava  # noqa: F401
from visionllm_tpu.data import grd_dataset as _grd  # noqa: F401
from visionllm_tpu.data import pose_dataset as _pose  # noqa: F401
from visionllm_tpu.data import gen_dataset as _gen  # noqa: F401
from visionllm_tpu.data import interactive_dataset as _inter  # noqa: F401
from visionllm_tpu.data import region_dataset as _region  # noqa: F401
from visionllm_tpu.data import mmic_dataset as _mmic  # noqa: F401
from visionllm_tpu.data import semseg_dataset as _semseg  # noqa: F401
from visionllm_tpu.data import det_variants as _detv  # noqa: F401
from visionllm_tpu.data import region_variants as _regv  # noqa: F401
from visionllm_tpu.data.build import (build_dataset, build_multi_datasets,
                                      ConcatDataset,
                                      TaskGroupedBatchSampler)
from visionllm_tpu.data.collator import collate
from visionllm_tpu.data.conversation import conv_templates, get_conv_template
