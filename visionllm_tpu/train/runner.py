"""Training entry point: config → datasets → sharded loop → checkpoints.

Behavioral reference: visionllmv2/train/train.py:271-709 (train():
tokenizer + special tokens, model assembly, freezing matrix, datasets +
collator, Trainer loop with task-grouped batches, auto-resume) and
VisionLLMv2Trainer (visionllmv2_trainer.py: per-group lr multipliers,
task-sourced batch sampler).

TPU-native: one pjit'd train step per tool group (the sampler guarantees
single-task batches), FSDP+TP sharding from parallel.mesh, orbax
checkpoints with latest-step resume, simple JSONL metric log.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from visionllm_tpu.config import VisionLLMConfig
from visionllm_tpu.data.build import (ConcatDataset, TaskGroupedBatchSampler,
                                      build_multi_datasets, group_of_task)
from visionllm_tpu.data.collator import collate
from visionllm_tpu.models.composite import VisionLLMWithTools
from visionllm_tpu.models.visionllm import SpecialTokenIds
from visionllm_tpu.parallel.mesh import build_mesh, shard_batch, shard_params
from visionllm_tpu.train.train_step import (OptimizerConfig, TrainState,
                                            build_optimizer,
                                            make_chat_train_step,
                                            make_det_train_step,
                                            make_gen_train_step,
                                            make_pose_train_step)
from visionllm_tpu.utils.checkpoint import (latest_step, restore_checkpoint,
                                            save_checkpoint)


@dataclasses.dataclass
class TrainConfig:
    output_dir: str = "output"
    batch_size: int = 8
    total_steps: int = 10_000
    log_every: int = 10
    save_every: int = 1000
    seed: int = 0
    n_model: int = 1                  # TP axis size
    num_workers: int = 2              # prefetch loader threads (0 = sync)
    num_obj_patches: int = 1          # pose obj/kpt query split
    optimizer: OptimizerConfig = dataclasses.field(
        default_factory=OptimizerConfig)
    # freezing matrix (reference train.py:533-558; modeling_sd.py:104-106
    # freezes the SD vae/text-encoder/unet, ip2p keeps its unet trainable)
    freeze_vis_encoder: bool = True
    freeze_llm: bool = False
    freeze_backbone: bool = False
    freeze_sd_unet: bool = True


class MetricLogger:
    """JSONL metrics + console (replaces HF Trainer logging/ProgressBar)."""

    def __init__(self, output_dir: str):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        row = {"step": step, "time": time.time()}
        row.update({k: float(v) for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")
        keys = ", ".join(f"{k}={float(v):.4f}" for k, v in
                         list(metrics.items())[:6])
        print(f"step {step}: {keys}", flush=True)


def frozen_predicate(tc: TrainConfig, model_cfg: VisionLLMConfig):
    def frozen(path: str) -> bool:
        if "lora_" in path:
            return False
        if tc.freeze_vis_encoder and path.startswith("core/vis_encoder"):
            return True
        if tc.freeze_llm and path.startswith("core/llm"):
            return True
        if tc.freeze_backbone and "/backbone/" in path:
            return True
        if path.startswith(("sd/vae", "ip2p/vae")):
            return True
        if tc.freeze_sd_unet and path.startswith("sd/unet"):
            return True
        return False
    return frozen


class Trainer:
    def __init__(self, model_cfg: VisionLLMConfig, tc: TrainConfig,
                 tid: SpecialTokenIds,
                 dtype=jnp.bfloat16, tool_dtype=jnp.float32):
        self.cfg = model_cfg
        self.tc = tc
        self.tid = tid
        self.model = VisionLLMWithTools(model_cfg, dtype=dtype,
                                        tool_dtype=tool_dtype)
        self.mesh = build_mesh(n_model=tc.n_model)
        self.logger = MetricLogger(tc.output_dir)
        self._steps: Dict[str, Any] = {}
        self._jitted: Dict[Any, Any] = {}

    # ------------------------------------------------------------------

    def init_state(self, example_batch: Dict[str, Any]) -> TrainState:
        batch = to_device_tree(example_batch)
        params = self.model.init(jax.random.PRNGKey(self.tc.seed), batch,
                                 self.tid)["params"]
        self.tx = build_optimizer(self.tc.optimizer, params,
                                  frozen=frozen_predicate(self.tc, self.cfg))
        state = TrainState.create(params, self.tx)
        ckpt_dir = os.path.join(self.tc.output_dir, "checkpoints")
        if latest_step(ckpt_dir) is not None:
            state = restore_checkpoint(ckpt_dir, state)
            print(f"resumed from step {int(state.step)}", flush=True)
        return state

    def step_fn_for(self, group: str):
        if group not in self._steps:
            if group == "gdino":
                fn = make_det_train_step(self.model, self.tx, self.tid)
            elif group == "unipose":
                fn = make_pose_train_step(self.model, self.tx, self.tid,
                                          self.tc.num_obj_patches)
            elif group == "sd":
                fn = make_gen_train_step(self.model, self.tx, self.tid)
            elif group == "ip2p":
                fn = make_gen_train_step(self.model, self.tx, self.tid,
                                         edit=True)
            else:
                fn = make_chat_train_step(self.model, self.tx, self.tid)
            self._steps[group] = fn
        return self._steps[group]

    def _jit_for(self, group: str, state, batch):
        key = (group, tuple(sorted(
            (k, tuple(np.shape(v))) for k, v in batch.items()
            if isinstance(v, np.ndarray))))
        if key not in self._jitted:
            from jax.sharding import NamedSharding, PartitionSpec as P
            step = self.step_fn_for(group)
            param_sh = shard_params(state.params, self.mesh)
            opt_sh = shard_params(state.opt_state, self.mesh)
            state_sh = TrainState(step=NamedSharding(self.mesh, P()),
                                  params=param_sh, opt_state=opt_sh)
            batch_sh = shard_batch(batch, self.mesh)
            self._jitted[key] = (jax.jit(
                step, in_shardings=(state_sh, batch_sh,
                                    NamedSharding(self.mesh, P())),
                out_shardings=(state_sh, NamedSharding(self.mesh, P()))),
                batch_sh)
        return self._jitted[key]

    def train(self, dataset_cfgs: Sequence[Dict], tokenizer,
              max_steps: Optional[int] = None) -> TrainState:
        tc = self.tc
        concat = build_multi_datasets(dataset_cfgs, tokenizer)
        sampler = TaskGroupedBatchSampler(concat, tc.batch_size,
                                          seed=tc.seed)
        # init from the first batch
        it = iter(sampler)
        first_idx = next(it)
        example = collate([concat[i] for i in first_idx])
        example.pop("img_metas", None)
        example.pop("captions", None)
        state = self.init_state(example)

        rng = jax.random.PRNGKey(tc.seed)
        step_i = int(state.step)
        limit = max_steps or tc.total_steps
        ckpt_dir = os.path.join(tc.output_dir, "checkpoints")
        # prefetch loader: batch N+1.. builds on worker threads (native
        # GIL-releasing image kernels) while the chip runs step N
        from visionllm_tpu.data.loader import PrefetchLoader

        class _Indexed:
            def __getitem__(_, i):
                return i, concat[i]

        def _coll(pairs):
            idx = [p[0] for p in pairs]
            batch = collate([p[1] for p in pairs])
            batch.pop("img_metas", None)
            batch.pop("captions", None)
            return idx, batch

        loader = PrefetchLoader(_Indexed(), [first_idx] + list(it),
                                _coll, num_workers=tc.num_workers)
        with self.mesh:
            for idx, batch in loader:
                if step_i >= limit:
                    break
                task = concat.task_of(idx[0])
                group = group_of_task(task)
                rng, sub = jax.random.split(rng)
                jitted, batch_sh = self._jit_for(group, state, batch)
                batch_dev = jax.device_put(batch, batch_sh)
                state, metrics = jitted(state, batch_dev, sub)
                step_i += 1
                if step_i % tc.log_every == 0:
                    self.logger.log(step_i, jax.device_get(metrics))
                if step_i % tc.save_every == 0:
                    save_checkpoint(ckpt_dir, step_i, jax.device_get(state))
        save_checkpoint(ckpt_dir, step_i, jax.device_get(state))
        return state


def to_device_tree(batch: Dict[str, Any]) -> Dict[str, Any]:
    return {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else
                ({kk: jnp.asarray(vv) for kk, vv in v.items()}
                 if isinstance(v, dict) else v))
            for k, v in batch.items()}
