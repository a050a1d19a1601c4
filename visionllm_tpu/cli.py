"""Command-line entry points (the reference's scripts/ layer).

Behavioral reference: scripts/vllmv2_7b/eval/dist_eval_*.sh (torchrun
wrappers around eval/eval_mem.py) and train launches. TPU-native: plain
python entry points — multi-host runs launch the same command per host
(jax.distributed.initialize picks up the TPU pod env) and shard work via
parallel.multihost.

Usage:
  python -m visionllm_tpu.cli eval-det  --ann ... --imgs ... --ckpt ...
  python -m visionllm_tpu.cli eval-pose --ann ... --imgs ... --ckpt ...
  python -m visionllm_tpu.cli eval-grd  --ann ... --imgs ... --ckpt ...
  python -m visionllm_tpu.cli train     --config cfg.json --data data.json
"""

from __future__ import annotations

import argparse
import json


def _load_model_and_params(args, tiny: bool = False):
    import jax.numpy as jnp

    from visionllm_tpu.config import (VisionLLMConfig, tiny_test_config,
                                      vllm_7b_config)
    from visionllm_tpu.models.composite import VisionLLMWithTools
    from visionllm_tpu.models.visionllm import SpecialTokenIds
    from visionllm_tpu.utils.checkpoint import load_params_npz

    if args.model_config:
        with open(args.model_config) as f:
            cfg = VisionLLMConfig.from_dict(json.load(f))
    else:
        cfg = tiny_test_config() if tiny else vllm_7b_config()
    model = VisionLLMWithTools(cfg, dtype=jnp.bfloat16)
    params = load_params_npz(args.ckpt) if args.ckpt else None
    tokenizer = None
    if args.tokenizer:
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
        tid = SpecialTokenIds.from_tokenizer(tokenizer)
    else:
        tid = SpecialTokenIds.synthetic()
    return cfg, model, params, tokenizer, tid


def _init_from_sample(model, sample, tid):
    """Random-init params shaped by one dataset sample (smoke runs
    without a checkpoint)."""
    import jax
    import jax.numpy as jnp
    from visionllm_tpu.models.composite import VisionLLMWithTools
    return model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(sample["input_ids"])[None],
        jnp.asarray(sample["image"])[None],
        jnp.asarray(sample["image_aug"])[None], tid,
        method=VisionLLMWithTools.infer_det)["params"]


def _common(sub):
    sub.add_argument("--ann", required=True)
    sub.add_argument("--imgs", required=True)
    sub.add_argument("--ckpt", default=None)
    sub.add_argument("--model-config", default=None)
    sub.add_argument("--tokenizer", default=None)
    sub.add_argument("--limit", type=int, default=None)
    sub.add_argument("--tiny", action="store_true")


def main(argv=None):
    parser = argparse.ArgumentParser("visionllm_tpu")
    subs = parser.add_subparsers(dest="cmd", required=True)
    det = subs.add_parser("eval-det")
    _common(det)
    det.add_argument("--with-mask", action="store_true")
    for name in ("eval-pose", "eval-grd"):
        _common(subs.add_parser(name))
    tr = subs.add_parser("train")
    tr.add_argument("--model-config", default=None)
    tr.add_argument("--data", required=True,
                    help="json list of dataset configs")
    tr.add_argument("--tokenizer", default=None)
    tr.add_argument("--output", default="output")
    tr.add_argument("--batch-size", type=int, default=8)
    tr.add_argument("--steps", type=int, default=1000)
    tr.add_argument("--tiny", action="store_true")
    args = parser.parse_args(argv)

    if args.cmd == "eval-det":
        from visionllm_tpu.utils.simple_tokenizer import MockTokenizer
        cfg, model, params, tok, tid = _load_model_and_params(
            args, args.tiny)
        tok = tok or MockTokenizer()
        from visionllm_tpu.data.det_dataset import CocoDetDataset
        from visionllm_tpu.eval.eval_det import evaluate_det
        ds = CocoDetDataset(args.ann, args.imgs, tok, test_mode=True,
                            image_size=cfg.vis_encoder.image_size)
        if params is None:
            params = _init_from_sample(model, ds[0], tid)
        res = evaluate_det(model, params, ds, tid, limit=args.limit,
                           with_mask=getattr(args, "with_mask", False))
        print(json.dumps(res))
    elif args.cmd == "eval-grd":
        from visionllm_tpu.utils.simple_tokenizer import MockTokenizer
        cfg, model, params, tok, tid = _load_model_and_params(
            args, args.tiny)
        tok = tok or MockTokenizer()
        from visionllm_tpu.data.grd_dataset import RefCocoGrdDataset
        from visionllm_tpu.eval.eval_grd import evaluate_grd
        ds = RefCocoGrdDataset(args.ann, args.imgs, tok, test_mode=True,
                               image_size=cfg.vis_encoder.image_size)
        if params is None:
            params = _init_from_sample(model, ds[0], tid)
        res = evaluate_grd(model, params, ds, tid, limit=args.limit)
        print(json.dumps(res))
    elif args.cmd == "train":
        import jax.numpy as jnp
        from visionllm_tpu.config import tiny_test_config, vllm_7b_config
        from visionllm_tpu.models.visionllm import SpecialTokenIds
        from visionllm_tpu.train.runner import TrainConfig, Trainer
        cfg = tiny_test_config() if args.tiny else vllm_7b_config()
        with open(args.data) as f:
            ds_cfgs = json.load(f)
        if args.tokenizer:
            from transformers import AutoTokenizer
            tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
            tid = SpecialTokenIds.from_tokenizer(tokenizer)
        else:
            from visionllm_tpu.utils.simple_tokenizer import MockTokenizer
            tokenizer = MockTokenizer()
            tid = SpecialTokenIds.synthetic()
        tc = TrainConfig(output_dir=args.output,
                         batch_size=args.batch_size,
                         total_steps=args.steps)
        Trainer(cfg, tc, tid).train(ds_cfgs, tokenizer)
    else:
        parser.error(f"unknown command {args.cmd}")


if __name__ == "__main__":
    main()
