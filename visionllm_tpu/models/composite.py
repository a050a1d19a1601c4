"""Composite trainable model: VisionLLM core + atom-tool decoders in one
parameter tree, with per-task forward methods.

Behavioral reference: visionllmv2/model/modeling_visionllmv2.py:394-897 —
forward() computes the LM loss and routes [EMB] hidden states to the
task decoder named by `batch["task"]`, summing losses. Here each task is
its own method (jit'd separately per task — the reference's
RandomTaskSourcedBatchSampler already guarantees a whole batch shares
one task, so per-task compilation matches the real training loop).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from visionllm_tpu import constants as C
from visionllm_tpu.config import VisionLLMConfig
from visionllm_tpu.models.grounding_dino.model import GroundingDino
from visionllm_tpu.models.stable_diffusion.sd_head import (
    InstructPix2PixWithLLMEmb, StableDiffusionWithLLMEmb)
from visionllm_tpu.models.unipose.model import UniPose
from visionllm_tpu.models.visionllm import SpecialTokenIds, VisionLLM
from visionllm_tpu.train.losses import lm_cross_entropy


class VisionLLMWithTools(nn.Module):
    """One module = one checkpointable params tree for the whole system."""

    cfg: VisionLLMConfig
    dtype: jnp.dtype = jnp.bfloat16
    # the reference deploys the WHOLE composite — tools included — in
    # bf16 (train.py loads every submodel with torch_dtype=bfloat16);
    # loss-side math and the deformable sampling geometry stay f32
    # regardless (train/losses.py, ops/ms_deform_attn.py)
    tool_dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        self.core = VisionLLM(cfg, self.dtype, name="core")
        if cfg.use_gdino:
            self.gdino = GroundingDino(cfg.gdino, self.tool_dtype,
                                       name="gdino")
        if cfg.use_unipose:
            self.unipose = UniPose(cfg.unipose, self.tool_dtype,
                                   name="unipose")
        if cfg.use_sd:
            self.sd = StableDiffusionWithLLMEmb(cfg.sd, self.dtype,
                                                name="sd")
        if cfg.use_ip2p:
            self.ip2p = InstructPix2PixWithLLMEmb(cfg.ip2p, self.dtype,
                                                  name="ip2p")

    # ------------------------------------------------------------------

    def forward_chat(self, batch: Dict[str, Any], tid: SpecialTokenIds
                     ) -> Dict[str, Any]:
        """VLM-only loss (chat/VQA/caption/region batches; `regions`
        visual prompts feed the RegionEncoder at <region> tokens)."""
        out = self.core(batch["input_ids"], batch.get("images"), tid,
                        attn_mask=batch.get("attn_mask"),
                        regions=batch.get("regions"))
        loss = lm_cross_entropy(out["logits"], batch["labels"])
        # image/token mismatch → loss×0 (reference ignore_flag,
        # modeling_visionllmv2.py:756-757); grads flow but are zeros
        loss = loss * (1.0 - out["ignore_flag"])
        return {"loss": loss, "lm_loss": loss, "logits": out["logits"],
                "ignore_flag": out["ignore_flag"]}

    def forward_det(self, batch: Dict[str, Any], tid: SpecialTokenIds,
                    dn_rng=None) -> Dict[str, Any]:
        """LLM forward + text-query extraction + grounding-dino forward.

        batch: input_ids/labels/attn_mask, images (CLIP pixels NHWC),
        images_aug (det pixels NHWC), pixel_mask, plus det targets
        handled by the caller's loss. With `dn_rng`, contrastive
        denoising queries are built inside gdino from batch["targets"].
        """
        out = self.core(batch["input_ids"], batch.get("images"), tid,
                        attn_mask=batch.get("attn_mask"))
        lm_loss = (lm_cross_entropy(out["logits"], batch["labels"])
                   * (1.0 - out["ignore_flag"]))
        tq, tq_mask = self.core.extract_text_query(
            out["hidden"], batch["input_ids"], tid)
        det_out = self.gdino(
            batch["images_aug"].astype(self.tool_dtype),
            tq.astype(self.tool_dtype), tq_mask,
            pixel_mask=batch.get("pixel_mask"), dn=batch.get("dn"),
            targets=batch.get("targets") if dn_rng is not None else None,
            dn_rng=dn_rng)
        det_out["text_mask"] = _text_mask(
            tq_mask, self.cfg.gdino.max_text_len)
        return {"lm_loss": lm_loss, "det": det_out,
                "ignore_flag": out["ignore_flag"]}

    def forward_pose(self, batch: Dict[str, Any], tid: SpecialTokenIds,
                     num_obj_patches: int, dn_rng=None) -> Dict[str, Any]:
        """LLM forward + obj/kpt query split + unipose forward.

        The reference splits emb groups into object vs keypoint queries
        by the dataset's id2index count (modeling_visionllmv2.py:802-834);
        here `num_obj_patches` is that static per-batch split point.
        """
        out = self.core(batch["input_ids"], batch.get("images"), tid,
                        attn_mask=batch.get("attn_mask"))
        lm_loss = (lm_cross_entropy(out["logits"], batch["labels"])
                   * (1.0 - out["ignore_flag"]))
        tq, tq_mask = self.core.extract_text_query(
            out["hidden"], batch["input_ids"], tid)
        obj_q = tq[:, :num_obj_patches].astype(self.tool_dtype)
        obj_m = tq_mask[:, :num_obj_patches]
        kpt_q = tq[:, num_obj_patches:].astype(self.tool_dtype)
        kpt_m = tq_mask[:, num_obj_patches:]
        pose_out = self.unipose(
            batch["images_aug"].astype(self.tool_dtype), obj_q, obj_m,
            kpt_q, kpt_m, pixel_mask=batch.get("pixel_mask"),
            targets=batch.get("targets") if dn_rng is not None else None,
            dn_rng=dn_rng)
        return {"lm_loss": lm_loss, "pose": pose_out,
                "ignore_flag": out["ignore_flag"]}

    def forward_gen(self, batch: Dict[str, Any], tid: SpecialTokenIds,
                    rng: jnp.ndarray) -> Dict[str, Any]:
        """[GEN] batches: LM loss + SD ε-prediction loss
        (reference call stack SURVEY.md §3.5; text2img.py datasets)."""
        out = self.core(batch["input_ids"], batch.get("images"), tid,
                        attn_mask=batch.get("attn_mask"))
        lm_loss = (lm_cross_entropy(out["logits"], batch["labels"])
                   * (1.0 - out["ignore_flag"]))
        embs = self.core.extract_gen_embs(
            out["hidden"], batch["input_ids"], tid, C.TOOL_GEN)
        sd_out = self.sd.train_loss(
            embs, batch["output_images"], rng,
            caption_embeds=batch.get("caption_embeds"))
        return {"lm_loss": lm_loss, "sd": sd_out,
                "loss": lm_loss + sd_out["loss"]}

    def forward_edit(self, batch: Dict[str, Any], tid: SpecialTokenIds,
                     rng: jnp.ndarray) -> Dict[str, Any]:
        """[EDIT] batches: LM loss + IP2P ε-prediction loss."""
        out = self.core(batch["input_ids"], batch.get("images"), tid,
                        attn_mask=batch.get("attn_mask"))
        lm_loss = (lm_cross_entropy(out["logits"], batch["labels"])
                   * (1.0 - out["ignore_flag"]))
        embs = self.core.extract_gen_embs(
            out["hidden"], batch["input_ids"], tid, C.TOOL_EDIT)
        ip_out = self.ip2p.train_loss(
            embs, batch["input_images"], batch["output_images"], rng,
            caption_embeds=batch.get("caption_embeds"))
        return {"lm_loss": lm_loss, "ip2p": ip_out,
                "loss": lm_loss + ip_out["loss"]}

    # inference entry: single-image det given a ready prompt; `regions`
    # carries interactive visual prompts (eval_visual_prompt flow)
    def infer_det(self, input_ids, images, images_aug, tid,
                  pixel_mask=None, regions=None):
        out = self.core(input_ids, images, tid, compute_logits=False,
                        regions=regions)
        tq, tq_mask = self.core.extract_text_query(
            out["hidden"], input_ids, tid)
        return self.gdino(images_aug.astype(self.tool_dtype),
                          tq.astype(self.tool_dtype), tq_mask,
                          pixel_mask=pixel_mask)

    def infer_pose(self, input_ids, images, images_aug, tid,
                   num_obj_patches, pixel_mask=None):
        """Pose inference: prompt carries [DET][EMB..] for objects then
        [POSE][EMB..] per keypoint class (SURVEY §3.4)."""
        out = self.core(input_ids, images, tid, compute_logits=False)
        tq, tq_mask = self.core.extract_text_query(
            out["hidden"], input_ids, tid)
        obj_q = tq[:, :num_obj_patches].astype(self.tool_dtype)
        obj_m = tq_mask[:, :num_obj_patches]
        kpt_q = tq[:, num_obj_patches:].astype(self.tool_dtype)
        kpt_m = tq_mask[:, num_obj_patches:]
        return self.unipose(images_aug.astype(self.tool_dtype), obj_q,
                            obj_m, kpt_q, kpt_m, pixel_mask=pixel_mask)

    def __call__(self, batch: Dict[str, Any], tid: SpecialTokenIds):
        """Default = det path (initializes core + gdino params). Call
        init over each needed method for the full tree."""
        return self.forward_det(batch, tid)


def _text_mask(tq_mask: jnp.ndarray, max_text_len: int) -> jnp.ndarray:
    """[B, P] query-slot validity → [B, max_text_len] logit-column mask."""
    B, P = tq_mask.shape
    pad = max_text_len - P
    if pad > 0:
        return jnp.pad(tq_mask.astype(bool), ((0, 0), (0, pad)))
    return tq_mask.astype(bool)[:, :max_text_len]
