"""The composite VisionLLM model: vision encoder → VL bridge → LLM, with
super-link routing of [EMB] hidden states to atom-tool decoders.

Behavioral reference: visionllmv2/model/modeling_visionllmv2.py:394-897.

TPU-first redesign of the routing machinery
-------------------------------------------
The reference splices learnable embeddings into the sequence with ragged
python loops over ``torch.where`` results (:426-527). Here every step is
a fixed-shape vectorized op:

* datasets/prompts ALWAYS materialize the [EMB] token ids in input_ids
  (the reference already does this for training and eval; for generation
  our decode loop appends them explicitly), so splicing is embedding-row
  *replacement*, never concatenation;
* which tool's table a given [EMB] position reads from is derived with a
  "last tool token" associative scan over the sequence — O(L log L), no
  data-dependent control flow;
* [EMB] hidden-state extraction for the tool decoders compacts masked
  positions with a stable argsort into a fixed [B, max_patches, num_embs]
  buffer (the reference pads to max_num_patches anyway).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from visionllm_tpu import constants as C
from visionllm_tpu.config import VisionLLMConfig
from visionllm_tpu.models.clip_vit import ClipVisionTower
from visionllm_tpu.models.llama import KVCache, LlamaModel
from visionllm_tpu.models.region_encoder import RegionEncoder
from visionllm_tpu.models.vl_bridge import VLBridge, pixel_shuffle


@dataclasses.dataclass(frozen=True)
class SpecialTokenIds:
    """Token ids of the routing vocabulary — static (hashable) for jit."""

    pad: int
    img: int
    imp: int
    reg: int
    emb: int          # [EMB]; [EMB2..8] are emb+1..emb+7 (contiguous)
    det: int
    grd: int
    seg: int
    pose: int
    gen: int
    edit: int

    @classmethod
    def from_tokenizer(cls, tok) -> "SpecialTokenIds":
        t = C.DEFAULT_TOKENS
        get = lambda k: tok.convert_tokens_to_ids(t[k])
        ids = cls(pad=tok.pad_token_id, img=get("img"), imp=get("imp"),
                  reg=get("reg"), emb=get("emb"), det=get("det"),
                  grd=get("grd"), seg=get("seg"), pose=get("pose"),
                  gen=get("gen"), edit=get("edit"))
        # the [EMB]..[EMB8] block must be contiguous (routing relies on it)
        assert get("emb8") == ids.emb + 7, "EMB ids must be contiguous"
        return ids

    @classmethod
    def synthetic(cls, base: int = 32000) -> "SpecialTokenIds":
        """Id layout matching the reference's token-addition order
        (train.py:350-354 adds DEFAULT_TOKENS minus the 4 pre-existing)."""
        order = ["img", "imp", "reg", "boi", "eoi", "sor", "eor", "sod",
                 "eod", "sog", "eog", "det", "grd", "seg", "pose", "gen",
                 "edit", "emb", "emb2", "emb3", "emb4", "emb5", "emb6",
                 "emb7", "emb8"]
        ids = {k: base + i for i, k in enumerate(order)}
        return cls(pad=0, img=ids["img"], imp=ids["imp"], reg=ids["reg"],
                   emb=ids["emb"], det=ids["det"], grd=ids["grd"],
                   seg=ids["seg"], pose=ids["pose"], gen=ids["gen"],
                   edit=ids["edit"])


def tool_context(input_ids: jnp.ndarray, tid: SpecialTokenIds
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-position (tool_code, last_tool_position) via an inclusive
    "last non-zero" associative scan. tool_code: constants.TOOL_*."""
    code = jnp.zeros_like(input_ids)
    for ids, c in (((tid.det, tid.seg, tid.grd), C.TOOL_DET),
                   ((tid.pose,), C.TOOL_POSE),
                   ((tid.gen,), C.TOOL_GEN),
                   ((tid.edit,), C.TOOL_EDIT)):
        for t in ids:
            code = jnp.where(input_ids == t, c, code)
    L = input_ids.shape[-1]
    pos = jnp.broadcast_to(jnp.arange(L), input_ids.shape)
    packed = jnp.stack([code, pos], axis=-1)

    def op(a, b):
        keep_b = b[..., :1] != 0
        return jnp.where(keep_b, b, a)

    scanned = jax.lax.associative_scan(op, packed, axis=-2)
    return scanned[..., 0], scanned[..., 1]


def compact_masked_rows(
    x: jnp.ndarray,          # [B, L, C]
    mask: jnp.ndarray,       # [B, L] bool
    out_len: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather rows where mask is True, in order, into [B, out_len, C];
    second return is the valid-slot mask [B, out_len]."""
    B, L, Cdim = x.shape
    order = jnp.argsort(~mask, axis=1, stable=True)        # True rows first
    if out_len > L:       # short sequences: surplus slots read row 0 and
        order = jnp.pad(order, ((0, 0), (0, out_len - L)))  # are masked off
    idx = order[:, :out_len]
    rows = jnp.take_along_axis(x, idx[..., None], axis=1)
    counts = jnp.sum(mask, axis=1)
    valid = jnp.arange(out_len)[None, :] < counts[:, None]
    return jnp.where(valid[..., None], rows, 0), valid


class VisionLLM(nn.Module):
    """Composite model. Atom-tool decoders (gdino/unipose/sd/ip2p) are
    separate modules invoked with the text queries this model extracts —
    keeping each independently jit-able and shardable."""

    cfg: VisionLLMConfig
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        if cfg.vis_encoder.arch == "intern_vit":
            from visionllm_tpu.models.intern_vit import InternVisionTower
            self.vis_encoder = InternVisionTower(cfg.vis_encoder, self.dtype,
                                                 name="vis_encoder")
        else:
            self.vis_encoder = ClipVisionTower(cfg.vis_encoder, self.dtype,
                                               name="vis_encoder")
        self.vl_bridge = VLBridge(cfg.vl_bridge_type, cfg.llm.hidden_size,
                                  self.dtype, name="vl_bridge")
        self.llm = LlamaModel(cfg.llm, self.dtype, name="llm")
        init = nn.initializers.normal(0.02)
        hid = cfg.llm.hidden_size
        self.emb_embeddings_det = self.param(
            "emb_embeddings_det", init, (cfg.num_embs, hid), jnp.float32)
        self.emb_embeddings_pose = self.param(
            "emb_embeddings_pose", init, (cfg.num_embs, hid), jnp.float32)
        self.emb_embeddings_gen = self.param(
            "emb_embeddings_gen", init, (cfg.num_embs_gen, hid), jnp.float32)
        self.emb_embeddings_edit = self.param(
            "emb_embeddings_edit", init, (cfg.num_embs_gen, hid), jnp.float32)
        if cfg.use_region_encoder:
            self.region_encoder = RegionEncoder(
                cfg.region_encoder, self.dtype, name="region_encoder")

    # ------------------------------------------------------------------
    # pieces
    # ------------------------------------------------------------------

    def encode_images(self, images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """images [N, H, W, 3] (NHWC, normalized) → (llm-space features
        [N, img_len, hid], all vit hidden states [n_layers+1, N, 1+P, D]).

        anyres batches arrive as [B, T, H, W, 3] (T tiles per sample,
        reference mm_utils.py:39-77 tiling) and are flattened to
        [B·T, ...]; the flattened tile order matches the <im_patch>
        scatter order."""
        cfg = self.cfg
        if images.ndim == 5:
            images = images.reshape(-1, *images.shape[2:])
        hs = self.vis_encoder(images)
        feats = hs[cfg.vis_encoder.output_layer][:, 1:]     # drop CLS
        if cfg.use_pixelshuffle:
            N, P, D = feats.shape
            side = int(P ** 0.5)
            feats = pixel_shuffle(feats.reshape(N, side, side, D), 0.5)
            feats = feats.reshape(N, -1, feats.shape[-1])
        return self.vl_bridge(feats), hs

    def embed_tokens(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.llm.embed(input_ids)

    def encode_regions(
        self,
        images: jnp.ndarray,           # [n_reg, H, W, 3] (image per region)
        region_masks: jnp.ndarray,     # [n_reg, H, W] binary
        vit_hs: jnp.ndarray,           # [n_layers+1, N, 1+P, D] from encode_images
        image_index: jnp.ndarray,      # [n_reg] which image each region is on
    ) -> jnp.ndarray:
        """Region features for <region> tokens (reference
        modeling_visionllmv2.py:608-716: last-3 ViT levels, CLS dropped)."""
        feats = [vit_hs[lvl][image_index, 1:] for lvl in (-3, -2, -1)]
        return self.region_encoder(images, region_masks, feats)

    def splice_emb_embeddings(
        self,
        inputs_embeds: jnp.ndarray,    # [B, L, C]
        input_ids: jnp.ndarray,        # [B, L]
        tid: SpecialTokenIds,
    ) -> jnp.ndarray:
        """Replace rows at [EMB]-range positions with the owning tool's
        learnable embeddings (reference :426-527, vectorized)."""
        cfg = self.cfg
        ctx, last_pos = tool_context(input_ids, tid)
        L = input_ids.shape[-1]
        pos = jnp.broadcast_to(jnp.arange(L), input_ids.shape)

        is_emb = ((input_ids >= tid.emb)
                  & (input_ids < tid.emb + cfg.num_embs))
        off_p = jnp.clip(input_ids - tid.emb, 0, cfg.num_embs - 1)
        off_g = jnp.clip(pos - last_pos - 1, 0, cfg.num_embs_gen - 1)

        rows_det = self.emb_embeddings_det[off_p].astype(inputs_embeds.dtype)
        rows_pose = self.emb_embeddings_pose[off_p].astype(inputs_embeds.dtype)
        rows_gen = self.emb_embeddings_gen[off_g].astype(inputs_embeds.dtype)
        rows_edit = self.emb_embeddings_edit[off_g].astype(inputs_embeds.dtype)

        out = inputs_embeds
        sel = lambda c: (is_emb & (ctx == c))[..., None]
        out = jnp.where(sel(C.TOOL_DET), rows_det, out)
        out = jnp.where(sel(C.TOOL_POSE), rows_pose, out)
        out = jnp.where(sel(C.TOOL_GEN), rows_gen, out)
        out = jnp.where(sel(C.TOOL_EDIT), rows_edit, out)
        return out

    @staticmethod
    def scatter_image_features(
        inputs_embeds: jnp.ndarray,    # [B, L, C]
        input_ids: jnp.ndarray,        # [B, L]
        image_features: jnp.ndarray,   # [N, img_len, C] (flattened order)
        imp_token_id: int,
    ) -> jnp.ndarray:
        """Write image features into the <im_patch> slots, in flattened
        batch-major order (reference :581-605). The data pipeline
        guarantees count(<im_patch>) == N * img_len."""
        B, L, Cdim = inputs_embeds.shape
        flat_sel = (input_ids == imp_token_id).reshape(-1)
        feats = image_features.reshape(-1, Cdim).astype(inputs_embeds.dtype)
        src = jnp.clip(jnp.cumsum(flat_sel) - 1, 0, feats.shape[0] - 1)
        gathered = feats[src]
        out = jnp.where(flat_sel[:, None], gathered,
                        inputs_embeds.reshape(-1, Cdim))
        return out.reshape(B, L, Cdim)

    @staticmethod
    def scatter_image_features_per_sample(
        inputs_embeds: jnp.ndarray,    # [B, L, C]
        input_ids: jnp.ndarray,        # [B, L]
        image_features: jnp.ndarray,   # [B, F, C] per-sample feature rows
        imp_token_id: int,
    ) -> jnp.ndarray:
        """Per-sample variant for padded tile stacks: sample b's k-th
        <im_patch> reads image_features[b, k]. Required when tile counts
        are ragged (anyres/mmic) — the global flattened cumsum would pull
        pad-tile features into later samples."""
        F = image_features.shape[1]
        sel = input_ids == imp_token_id
        src = jnp.clip(jnp.cumsum(sel, axis=1) - 1, 0, F - 1)
        gathered = jnp.take_along_axis(
            image_features.astype(inputs_embeds.dtype),
            src[..., None], axis=1)
        return jnp.where(sel[..., None], gathered, inputs_embeds)

    def extract_text_query(
        self,
        hidden: jnp.ndarray,           # [B, L, C] post-final-norm
        input_ids: jnp.ndarray,        # [B, L]
        tid: SpecialTokenIds,
        max_patches: Optional[int] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Gather [EMB]-position hidden states → text_query
        [B, max_patches, num_embs, C] + mask [B, max_patches]
        (reference :775-788)."""
        cfg = self.cfg
        max_patches = max_patches or cfg.max_num_patches
        emb_sel = ((input_ids >= tid.emb)
                   & (input_ids < tid.emb + cfg.num_embs))
        rows, valid = compact_masked_rows(
            hidden, emb_sel, max_patches * cfg.num_embs)
        B, _, Cdim = hidden.shape
        tq = rows.reshape(B, max_patches, cfg.num_embs, Cdim)
        tq_mask = valid.reshape(B, max_patches, cfg.num_embs)[..., 0]
        return tq, tq_mask

    def extract_gen_embs(
        self,
        hidden: jnp.ndarray,           # [B, L, C]
        input_ids: jnp.ndarray,        # [B, L]
        tid: SpecialTokenIds,
        tool_code: int,                # C.TOOL_GEN or C.TOOL_EDIT
    ) -> jnp.ndarray:
        """Hidden states at the num_embs_gen [EMB] rows after [GEN]/[EDIT]
        (one trigger per sample — reference modeling_sd.py:123-127) →
        [B, num_embs_gen, C]."""
        cfg = self.cfg
        ctx, _ = tool_context(input_ids, tid)
        is_emb = ((input_ids >= tid.emb)
                  & (input_ids < tid.emb + cfg.num_embs))
        rows, _ = compact_masked_rows(
            hidden, is_emb & (ctx == tool_code), cfg.num_embs_gen)
        return rows

    def llm_step(
        self,
        inputs_embeds: jnp.ndarray,    # [B, 1, C] — pre-built decode input
        positions: jnp.ndarray,        # [B, 1]
        cache: KVCache,
        attn_mask: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        """One decode step on pre-built embeddings (generation loop)."""
        hidden, logits, new_cache = self.llm(
            inputs_embeds.astype(self.dtype), positions,
            attn_mask=attn_mask, cache=cache, compute_logits=True)
        return {"hidden": hidden, "logits": logits, "cache": new_cache}

    def llm_window(
        self,
        inputs_embeds: jnp.ndarray,    # [B, W, C] — draft window inputs
        positions: jnp.ndarray,        # [B, W]
        cache: KVCache,
        attn_mask: Optional[jnp.ndarray] = None,   # [B, max_len]
    ) -> Dict[str, Any]:
        """W tokens in one cached forward (speculative-decode verify):
        appends the window at cache.index and attends history + the
        causal part of the window. Costs ~one decode step (decode is
        bound on the weight/cache HBM reads, which a W-token window
        amortizes) but yields up to W accepted tokens."""
        hidden, logits, new_cache = self.llm(
            inputs_embeds.astype(self.dtype), positions,
            attn_mask=attn_mask, cache=cache, compute_logits=True,
            extend=True)
        return {"hidden": hidden, "logits": logits, "cache": new_cache}

    # ------------------------------------------------------------------
    # main forward (training / prefill)
    # ------------------------------------------------------------------

    def __call__(
        self,
        input_ids: jnp.ndarray,             # [B, L]
        images: Optional[jnp.ndarray],      # [N, H, W, 3] or None
        tid: SpecialTokenIds,
        attn_mask: Optional[jnp.ndarray] = None,   # [B, L]
        positions: Optional[jnp.ndarray] = None,   # [B, L]
        cache: Optional[KVCache] = None,
        regions: Optional[jnp.ndarray] = None,     # [B, R, H, W] prompt masks
        region_features: Optional[jnp.ndarray] = None,  # [n_reg, C] pre-computed
        compute_logits: bool = True,
    ):
        """Returns dict(hidden, logits, cache, vit_hidden_states)."""
        inputs_embeds, ignore_flag, vit_hs = self.build_prompt_embeds(
            input_ids, images, tid, regions=regions,
            region_features=region_features)
        if positions is None:
            B, L = input_ids.shape
            positions = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
        hidden, logits, new_cache = self.llm(
            inputs_embeds, positions, attn_mask=attn_mask, cache=cache,
            compute_logits=compute_logits)
        return {"hidden": hidden, "logits": logits, "cache": new_cache,
                "ignore_flag": ignore_flag,
                "vit_hidden_states": vit_hs}

    def build_prompt_embeds(
        self,
        input_ids: jnp.ndarray,             # [B, L]
        images: Optional[jnp.ndarray],      # [N, H, W, 3] or None
        tid: SpecialTokenIds,
        regions: Optional[jnp.ndarray] = None,
        region_features: Optional[jnp.ndarray] = None,
    ):
        """The multimodal embedding assembly of the prefill WITHOUT the
        LLM: token embeddings + [EMB]-table splice + image-feature
        scatter (+ region encoder). Separated so chunked prefill
        (slots.py) can run the LLM over the result in bounded windows.
        Returns (inputs_embeds [B, L, C], ignore_flag, vit_hidden)."""
        cfg = self.cfg
        inputs_embeds = self.embed_tokens(input_ids)
        inputs_embeds = self.splice_emb_embeddings(inputs_embeds, input_ids,
                                                   tid)
        vit_hs = None
        # graceful degradation on image/token-count mismatch (reference
        # modeling_visionllmv2.py:591-604 → ignore_flag, loss×0 at
        # :756-757): a malformed batch whose <im_patch> count does not
        # match the image-feature count would silently mis-scatter;
        # detect it and let the loss be zeroed instead of training on
        # misaligned features. 0.0 = healthy, 1.0 = degrade.
        ignore_flag = jnp.zeros((), jnp.float32)
        if images is not None:
            image_features, vit_hs = self.encode_images(images)
            n_imp = jnp.sum(input_ids == tid.imp)
            if images.ndim == 5:
                B_, T_ = images.shape[:2]
                expected = B_ * T_ * image_features.shape[1]
                # padded tile stacks legitimately carry FEWER <im_patch>
                # tokens than B*T*img_len; only more-than-capacity is
                # definitely malformed
                ignore_flag = (n_imp > expected).astype(jnp.float32)
            else:
                expected = images.shape[0] * image_features.shape[1]
                ignore_flag = (n_imp != expected).astype(jnp.float32)
            if images.ndim == 5:
                # padded tile stacks: per-sample scatter so ragged tile
                # counts can't bleed across samples
                B_, T_ = images.shape[:2]
                feats_b = image_features.reshape(
                    B_, T_ * image_features.shape[1], -1)
                inputs_embeds = self.scatter_image_features_per_sample(
                    inputs_embeds, input_ids, feats_b, tid.imp)
            else:
                inputs_embeds = self.scatter_image_features(
                    inputs_embeds, input_ids, image_features, tid.imp)
        if (regions is not None and cfg.use_region_encoder
                and vit_hs is not None):
            # per-sample global image repeated per region slot; invalid
            # (empty-mask) slots run as dummies and are compacted away so
            # the <region> scatter order matches the valid regions only
            # (reference wiring modeling_visionllmv2.py:608-716)
            B, R = regions.shape[:2]
            if images.ndim == 5:        # anyres: global image = last tile
                T = images.shape[1]
                base = images[:, -1]
                sample_idx = (jnp.arange(B) + 1) * T - 1
            else:
                base = images
                sample_idx = jnp.arange(B)
            reg_imgs = jnp.repeat(base, R, axis=0)
            img_index = jnp.repeat(sample_idx, R)
            feats = self.encode_regions(
                reg_imgs, regions.reshape(B * R, *regions.shape[2:]),
                vit_hs, img_index)                       # [B*R, C]
            valid = jnp.sum(regions.reshape(B * R, -1), axis=-1) > 0
            rows, _ = compact_masked_rows(
                feats[None], valid[None], B * R)
            inputs_embeds = self.scatter_image_features(
                inputs_embeds, input_ids, rows[0][:, None, :], tid.reg)
        if region_features is not None:
            # replace <region> rows in flattened order
            inputs_embeds = self.scatter_image_features(
                inputs_embeds, input_ids, region_features[:, None, :],
                tid.reg)
        return inputs_embeds, ignore_flag, vit_hs
