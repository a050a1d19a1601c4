from visionllm_tpu.parallel.mesh import (
    MeshRules,
    build_mesh,
    shard_batch,
    shard_params,
)
from visionllm_tpu.parallel.sequence import constrain_seq
