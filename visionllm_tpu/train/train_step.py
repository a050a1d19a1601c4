"""Optimizer construction and the sharded training step.

Behavioral reference: visionllmv2/train/visionllmv2_trainer.py:356-455
(create_optimizer with 6 param groups: ×lr_multiplier for
backbone/sampling_offsets/reference_points, ×lr_llm_multiplier for
llm/region_encoder/vl_bridge, weight-decay split by ndim>=2) and the HF
Trainer/DeepSpeed loop it plugs into.

TPU-native: one pjit'd step over a ("data", "model") mesh — gradients
are averaged by XLA-inserted reduce-scatter/all-reduce over ICI (the
NCCL-allreduce equivalent), parameters/optimizer state FSDP-sharded by
the MeshRules table (ZeRO-equivalent).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from visionllm_tpu.config import VisionLLMConfig
from visionllm_tpu.models.composite import VisionLLMWithTools
from visionllm_tpu.models.visionllm import SpecialTokenIds
from visionllm_tpu.parallel.mesh import MeshRules, shard_batch, shard_params
from visionllm_tpu.train.losses import detection_loss_with_aux


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 2e-5
    lr_multiplier: float = 0.1        # backbone / sampling_offsets / ref pts
    lr_llm_multiplier: float = 1.0    # llm / region_encoder / vl_bridge
    weight_decay: float = 0.0
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    max_grad_norm: float = 1.0
    warmup_steps: int = 0
    total_steps: int = 10_000
    schedule: str = "cosine"          # "cosine" | "constant"
    grad_accum_steps: int = 1         # k micro-batches per optimizer step
                                      # (reference: HF TrainingArguments
                                      # gradient_accumulation_steps)


LOW_LR_PAT = re.compile(
    r"(backbone|sampling_offsets|reference_points_head|ref_point_head)")
LLM_LR_PAT = re.compile(r"(core/llm|core/vl_bridge|region_encoder)")


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def build_optimizer(cfg: OptimizerConfig, params: Any,
                    frozen: Optional[Callable[[str], bool]] = None
                    ) -> optax.GradientTransformation:
    """AdamW with per-group lr multipliers and optional freezing.

    `frozen(path) -> True` marks a parameter as not trainable (the
    reference freezing matrix, train/train.py:533-558)."""
    if cfg.schedule == "cosine":
        # warmup_steps=0 must mean "start at peak", not a zero first step
        init = cfg.learning_rate if cfg.warmup_steps == 0 else 0.0
        sched = optax.warmup_cosine_decay_schedule(
            init, cfg.learning_rate, max(cfg.warmup_steps, 1),
            max(cfg.total_steps, 2))
    else:
        sched = optax.constant_schedule(cfg.learning_rate)

    def group_of(path, leaf) -> str:
        name = _path_str(path)
        if frozen is not None and frozen(name):
            return "frozen"
        if LOW_LR_PAT.search(name):
            return "low"
        if LLM_LR_PAT.search(name):
            return "llm"
        return "base"

    labels = jax.tree_util.tree_map_with_path(group_of, params)

    def adamw(mult: float) -> optax.GradientTransformation:
        return optax.chain(
            optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1],
                                eps=cfg.eps),
            optax.add_decayed_weights(
                cfg.weight_decay,
                mask=lambda p: jax.tree.map(lambda x: x.ndim >= 2, p)),
            optax.scale_by_schedule(sched),
            optax.scale(-mult),
        )

    # The reference (HF Trainer/DeepSpeed) clips ONE global norm over all
    # trainable parameters; clipping per-lr-group would yield larger
    # updates whenever the total norm exceeds the cap. Frozen grads are
    # zeroed first so they don't inflate the norm (the reference never
    # computes them at all).
    zero_frozen = optax.multi_transform(
        {"base": optax.identity(), "low": optax.identity(),
         "llm": optax.identity(), "frozen": optax.set_to_zero()},
        labels)
    tx = optax.chain(
        zero_frozen,
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.multi_transform(
            {"base": adamw(1.0), "low": adamw(cfg.lr_multiplier),
             "llm": adamw(cfg.lr_llm_multiplier),
             "frozen": optax.set_to_zero()},
            labels))
    if cfg.grad_accum_steps > 1:
        # accumulate the MEAN gradient over k micro-batches and apply one
        # optimizer step (clipping sees the mean, matching a k×-larger
        # batch — the reference's gradient_accumulation_steps). The inner
        # schedule advances per APPLIED step, not per micro-step.
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx


def split_frozen(params, frozen: Callable[[str], bool]) -> Tuple[Any, Any]:
    """Split a param tree into (trainable, frozen) trees, with None at
    the complementary positions.

    None is an empty pytree: the trainable tree induces NO gradient
    buffers, optimizer state, or backward compute for frozen leaves —
    the memory/flops semantics of the reference's requires_grad=False
    freezing (train/train.py:533-558), which torch autograd honors but
    a whole-tree `jax.grad` does not."""
    def pick(keep_frozen):
        return jax.tree_util.tree_map_with_path(
            lambda p, x: x if frozen(_path_str(p)) == keep_frozen
            else None, params)
    return pick(False), pick(True)


def merge_frozen(trainable, frozen_tree):
    """Inverse of split_frozen (None-for-None positional merge)."""
    return jax.tree.map(lambda a, b: b if a is None else a,
                        trainable, frozen_tree,
                        is_leaf=lambda x: x is None)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx, frozen=None):
        """With `frozen`, optimizer state covers only the trainable
        subtree (pass the same predicate to make_*_train_step, and build
        `tx` over split_frozen(params, frozen)[0])."""
        target = split_frozen(params, frozen)[0] if frozen else params
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(target))


def _make_step(loss_fn, tx, frozen=None):
    """step(state, batch, rng) from loss_fn(params, batch, rng).

    frozen=None differentiates the whole param tree (grads for frozen
    leaves are computed then zeroed by the optimizer's `frozen` group —
    simple, but costs a full-tree gradient buffer plus backward flops
    through modules with no trainable ancestor). With a `frozen` path
    predicate, only the trainable subtree is differentiated: XLA prunes
    the backward of frozen-only prefixes (e.g. the vision encoder)
    entirely and the gradient/optimizer memory is O(trainable)."""
    if frozen is None:
        def step(state: TrainState, batch, rng=None):
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, batch, rng)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            return state.replace(step=state.step + 1, params=params,
                                 opt_state=opt_state), metrics
        return step

    def step(state: TrainState, batch, rng=None):
        train_p, frozen_p = split_frozen(state.params, frozen)

        def train_loss(tp, batch, rng):
            return loss_fn(merge_frozen(tp, frozen_p), batch, rng)

        (_, metrics), grads = jax.value_and_grad(
            train_loss, has_aux=True)(train_p, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, train_p)
        params = merge_frozen(optax.apply_updates(train_p, updates),
                              frozen_p)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), metrics
    return step


def make_det_train_step(
    model: VisionLLMWithTools,
    tx: optax.GradientTransformation,
    tid: SpecialTokenIds,
    frozen: Optional[Callable[[str], bool]] = None,
):
    """Returns step(state, batch, rng) -> (state, metrics) for det/grd/seg
    batches: LM CE + Hungarian-matched gdino losses (reference call stack
    SURVEY.md §3.1). See _make_step for `frozen` semantics."""
    gcfg = model.cfg.gdino

    def loss_fn(params, batch, rng):
        rng_dn, rng_loss = jax.random.split(rng)
        out = model.apply({"params": params}, batch, tid, rng_dn,
                          method=VisionLLMWithTools.forward_det)
        det = out["det"]
        det_outputs = {
            "all_logits": det["all_logits"],
            "all_boxes": det["all_boxes"],
            "all_masks": det["all_masks"],
            "enc_logits": det["enc_logits"],
            "enc_boxes": det["enc_boxes"],
            "text_mask": det["text_mask"],
        }
        det_total, detail = detection_loss_with_aux(
            det_outputs, batch["targets"], cfg=gcfg, rng=rng_loss)
        if "dn_all_logits" in det and det.get("dn_targets") is not None:
            from visionllm_tpu.train.cdn import dn_loss
            n_lvl = det["dn_all_logits"].shape[0]
            for lvl in range(n_lvl):
                d = dn_loss(det["dn_all_logits"][lvl],
                            det["dn_all_boxes"][lvl],
                            det["dn_targets"], cfg=gcfg,
                            text_mask=det["text_mask"])
                for k, v in d.items():
                    suffix = "" if lvl == n_lvl - 1 else f"_aux{lvl}"
                    detail[k + suffix] = v
                    det_total = det_total + v
        loss = out["lm_loss"] + det_total
        metrics = {"loss": loss, "lm_loss": out["lm_loss"],
                   "det_loss": det_total}
        metrics.update({k: v for k, v in detail.items()
                        if not ("aux" in k or "enc" in k)})
        return loss, metrics

    return _make_step(loss_fn, tx, frozen)


def make_pose_train_step(
    model: VisionLLMWithTools,
    tx: optax.GradientTransformation,
    tid: SpecialTokenIds,
    num_obj_patches: int,
    frozen: Optional[Callable[[str], bool]] = None,
):
    """Pose batches: LM CE + UniPose Hungarian losses with OKS
    (reference call stack SURVEY.md §3.4). Targets: labels/boxes/
    keypoints (xyxy..vv normalized)/area/valid, padded to
    N ≤ num_groups."""
    pcfg = model.cfg.unipose

    def loss_fn(params, batch, rng):
        from visionllm_tpu.train.cdn import dn_loss
        from visionllm_tpu.train.pose_losses import pose_loss_with_aux
        rng_dn, _ = jax.random.split(rng)
        out = model.apply({"params": params}, batch, tid, num_obj_patches,
                          rng_dn, method=VisionLLMWithTools.forward_pose)
        pose = out["pose"]
        pose_outputs = {
            "all_logits": pose["all_logits"],
            "all_boxes": pose["all_boxes"],
            "all_keypoints": pose["all_keypoints"],
            "enc_logits": pose["enc_logits"],
            "enc_boxes": pose["enc_boxes"],
        }
        pose_total, detail = pose_loss_with_aux(
            pose_outputs, batch["targets"], cfg=pcfg)
        if pose.get("dn_targets") is not None and pose["dn_logits"]:
            for lvl, (dl, db) in enumerate(zip(pose["dn_logits"],
                                               pose["dn_boxes"])):
                d = dn_loss(dl, db, pose["dn_targets"], cfg=pcfg)
                for k, v in d.items():
                    detail[f"{k}_l{lvl}"] = v
                    pose_total = pose_total + v
        loss = out["lm_loss"] + pose_total
        metrics = {"loss": loss, "lm_loss": out["lm_loss"],
                   "pose_loss": pose_total}
        metrics.update({k: v for k, v in detail.items() if "aux" not in k})
        return loss, metrics

    return _make_step(loss_fn, tx, frozen)


def make_gen_train_step(model: VisionLLMWithTools,
                        tx: optax.GradientTransformation,
                        tid: SpecialTokenIds, edit: bool = False,
                        frozen: Optional[Callable[[str], bool]] = None):
    """[GEN]/[EDIT] batches: LM CE + diffusion eps-prediction loss
    (reference call stack SURVEY.md §3.5)."""
    method = (VisionLLMWithTools.forward_edit if edit
              else VisionLLMWithTools.forward_gen)

    def loss_fn(params, batch, rng):
        out = model.apply({"params": params}, batch, tid, rng,
                          method=method)
        key = "ip2p" if edit else "sd"
        metrics = {"loss": out["loss"], "lm_loss": out["lm_loss"],
                   "image_loss": out[key]["image_loss"]}
        if "caption_loss" in out[key]:
            metrics["caption_loss"] = out[key]["caption_loss"]
        return out["loss"], metrics

    return _make_step(loss_fn, tx, frozen)


def make_chat_train_step(model: VisionLLMWithTools,
                         tx: optax.GradientTransformation,
                         tid: SpecialTokenIds,
                         frozen: Optional[Callable[[str], bool]] = None):
    def loss_fn(params, batch, rng=None):
        out = model.apply({"params": params}, batch, tid,
                          method=VisionLLMWithTools.forward_chat)
        return out["loss"], {"loss": out["loss"]}

    return _make_step(loss_fn, tx, frozen)


def shard_train_step(step_fn, mesh, state: TrainState, batch,
                     rules: Optional[MeshRules] = None):
    """jit `step_fn` with FSDP/TP parameter shardings and data-sharded
    batch; returns (jitted_fn, sharded_state, sharded_batch)."""
    param_sh = shard_params(state.params, mesh, rules)
    # optimizer state mirrors the param tree inside mu/nu etc., and the
    # rule regexes match anywhere in the joined path, so the same table
    # shards it consistently (ZeRO-style optimizer-state sharding).
    opt_sh = shard_params(state.opt_state, mesh, rules)
    state_sh = TrainState(step=NamedSharding(mesh, P()), params=param_sh,
                          opt_state=opt_sh)
    batch_sh = shard_batch(batch, mesh)
    jitted = jax.jit(step_fn,
                     in_shardings=(state_sh, batch_sh, NamedSharding(mesh, P())),
                     out_shardings=(state_sh, NamedSharding(mesh, P())))
    put_state = jax.device_put(state, state_sh)
    put_batch = jax.device_put(batch, batch_sh)
    return jitted, put_state, put_batch
