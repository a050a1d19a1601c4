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
    if getattr(args, "quant", "") or getattr(args, "kv_quant", ""):
        import dataclasses
        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(
                cfg.llm, quant=getattr(args, "quant", ""),
                kv_quant=getattr(args, "kv_quant", "")))
    model = VisionLLMWithTools(cfg, dtype=jnp.bfloat16)
    params = load_params_npz(args.ckpt) if args.ckpt else None
    if params is not None and getattr(args, "quant", ""):
        # checkpoints are stored bf16/f32; rewrite the LLM matmul
        # kernels to the int8 layout the quantized modules consume
        from visionllm_tpu.ops.quant import quantize_serving_params
        params = quantize_serving_params(
            params, bits=4 if args.quant == "int4" else 8)
    tokenizer = None
    if args.tokenizer:
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
        tid = SpecialTokenIds.from_tokenizer(tokenizer)
    else:
        tid = SpecialTokenIds.synthetic()
    return cfg, model, params, tokenizer, tid


def _build_core_generate(cfg, params, tid, tiny, max_new_tokens, tok):
    """Jitted emb-countdown generate over the composite core; random
    params if no checkpoint (smoke runs). Init includes a region so the
    RegionEncoder params exist when the eval passes `regions`."""
    import jax
    import jax.numpy as jnp
    from visionllm_tpu.generation import build_generate_fn
    from visionllm_tpu.models.visionllm import VisionLLM
    core = VisionLLM(cfg, dtype=jnp.float32 if tiny else jnp.bfloat16)
    gen = build_generate_fn(core, tid, max_new_tokens=max_new_tokens,
                            eos_id=tok.eos_token_id)
    if params is None:
        img_len = (cfg.vis_encoder.image_size // 14) ** 2
        ids = jnp.asarray([[1] + [tid.imp] * img_len + [tid.reg, 2]],
                          jnp.int32)
        size = cfg.vis_encoder.image_size
        regions = (jnp.ones((1, 1, size, size), jnp.float32)
                   if cfg.use_region_encoder else None)
        cparams = core.init(
            jax.random.PRNGKey(0), ids,
            jnp.zeros((1, size, size, 3), jnp.float32), tid,
            regions=regions)["params"]
    else:
        cparams = params["core"] if "core" in params else params
    return gen, cparams


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
    sub.add_argument("--ann", default=None)
    sub.add_argument("--imgs", default=None)
    sub.add_argument("--config", default=None,
                     help="eval config (path or shipped key like "
                          "'det/coco_val'); overrides --ann/--imgs")
    sub.add_argument("--ckpt", default=None)
    sub.add_argument("--model-config", default=None)
    sub.add_argument("--tokenizer", default=None)
    sub.add_argument("--limit", type=int, default=None)
    sub.add_argument("--tiny", action="store_true")
    sub.add_argument("--quant", default="", choices=["", "int8", "w8a8", "int4"],
                     help="serving-only weight quantization of the LLM "
                          "matmuls (ops/quant.py). int8/w8a8 are the "
                          "fast paths; int4 halves weight HBM but is "
                          "NOT faster than int8 on v5e — see "
                          "docs/INT4_KERNEL.md")
    sub.add_argument("--kv-quant", default="", choices=["", "int8"],
                     help="serving-only int8 KV-cache storage "
                          "(per-token/head scales, ops/quant.py)")
    _dist_flags(sub)


def _dataset_cfgs(args, default_type: str):
    """--config (declarative, possibly several datasets) or --ann/--imgs
    (single ad-hoc dataset)."""
    if args.config:
        from visionllm_tpu.eval.configs import load_eval_config
        return load_eval_config(args.config)
    if not (args.ann and args.imgs):
        raise SystemExit("need --config or both --ann and --imgs")
    return [{"type": default_type, "ann_file": args.ann,
             "img_prefix": args.imgs, "test_mode": True}]


def _slurm_head_node(node_list: str) -> str:
    """First hostname of a slurm node list. Prefers `scontrol show
    hostname` (authoritative expansion); falls back to parsing the
    compressed form (e.g. "tpu-host-[3-5,9],other-1" -> "tpu-host-3")
    when scontrol is unavailable on the host."""
    import subprocess
    try:
        out = subprocess.run(
            ["scontrol", "show", "hostname", node_list],
            capture_output=True, text=True, timeout=10)
        first = out.stdout.split()
        if out.returncode == 0 and first:
            return first[0]
    except (OSError, subprocess.TimeoutExpired):
        pass
    head = node_list.split(",")[0]
    if "[" in head:
        prefix, rng = head.split("[", 1)
        return prefix + rng.rstrip("]").split(",")[0].split("-")[0]
    return head


def dist_kwargs_from_env(environ) -> dict:
    """jax.distributed.initialize kwargs from a scheduler environment.

    The reference supports three launchers (visionllmv2/dist_utils.py:
    33-104 — pytorch env://, OpenMPI, slurm); TPU pods autodetect, so
    the explicit paths here cover the same non-pod launchers:
      - slurm: SLURM_PROCID / SLURM_NTASKS / SLURM_NODELIST, coordinator
        = first node of the list (dist_utils.py:67-104 semantics), port
        from MASTER_PORT else 29500.
      - OpenMPI: OMPI_COMM_WORLD_RANK / _SIZE + MASTER_ADDR
        (dist_utils.py:58-64).
      - torchrun-style env://: RANK / WORLD_SIZE / MASTER_ADDR.
    Returns {} when no scheduler env is present (TPU-pod autodetect)."""
    port = environ.get("MASTER_PORT", "29500")
    if "SLURM_PROCID" in environ and "SLURM_NTASKS" in environ:
        addr = environ.get("MASTER_ADDR") or _slurm_head_node(
            environ["SLURM_NODELIST"])
        return dict(coordinator_address=f"{addr}:{port}",
                    num_processes=int(environ["SLURM_NTASKS"]),
                    process_id=int(environ["SLURM_PROCID"]))
    if "OMPI_COMM_WORLD_RANK" in environ:
        if "MASTER_ADDR" not in environ:
            raise KeyError(
                "MPI launch: the environment variable MASTER_ADDR "
                "is not set")
        return dict(
            coordinator_address=f"{environ['MASTER_ADDR']}:{port}",
            num_processes=int(environ["OMPI_COMM_WORLD_SIZE"]),
            process_id=int(environ["OMPI_COMM_WORLD_RANK"]))
    if "RANK" in environ and "WORLD_SIZE" in environ \
            and "MASTER_ADDR" in environ:
        return dict(
            coordinator_address=f"{environ['MASTER_ADDR']}:{port}",
            num_processes=int(environ["WORLD_SIZE"]),
            process_id=int(environ["RANK"]))
    return {}


def _maybe_init_distributed(args) -> None:
    """Multi-host: every host runs the same command; jax.distributed
    wires the processes together (see docs/MULTIHOST.md). On TPU pods
    initialize() autodetects coordinator/count/id from the TPU
    metadata; under slurm/MPI/torchrun the scheduler env supplies them
    (dist_kwargs_from_env); elsewhere pass the three flags
    explicitly."""
    if not getattr(args, "distributed", False):
        return
    import os

    import jax
    if args.coordinator:
        kwargs = dict(coordinator_address=args.coordinator,
                      num_processes=args.num_processes,
                      process_id=args.process_id)
    else:
        kwargs = dist_kwargs_from_env(os.environ)
    jax.distributed.initialize(**kwargs)


def _dist_flags(p) -> None:
    p.add_argument("--distributed", action="store_true",
                   help="multi-host run: jax.distributed.initialize() "
                        "(auto-config on TPU pods)")
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (non-pod environments)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)


def main(argv=None):
    parser = argparse.ArgumentParser("visionllm_tpu")
    subs = parser.add_subparsers(dest="cmd", required=True)
    det = subs.add_parser("eval-det")
    _common(det)
    det.add_argument("--with-mask", action="store_true")
    for name in ("eval-pose", "eval-grd", "eval-semseg",
                 "eval-interactive"):
        _common(subs.add_parser(name))
    reg = subs.add_parser(
        "eval-region", help="region-prompted generation evals "
        "(caption/recognition/classification/vcr — the reference's "
        "eval_region_*.py family)")
    reg.add_argument("--task", required=True,
                     choices=("region-caption", "region-recognition",
                              "region-classification", "vcr"))
    reg.add_argument("--ann", required=True)
    reg.add_argument("--imgs", default="")
    reg.add_argument("--vocab", default="coco",
                     help="recognition vocabulary tag (coco|lvis)")
    reg.add_argument("--test-format", default="bbox",
                     choices=("bbox", "mask"))
    reg.add_argument("--ckpt", default=None)
    reg.add_argument("--model-config", default=None)
    reg.add_argument("--tokenizer", default=None)
    reg.add_argument("--limit", type=int, default=None)
    reg.add_argument("--tiny", action="store_true")
    reg.add_argument("--max-new-tokens", type=int, default=None)
    reg.add_argument("--quant", default="", choices=["", "int8", "w8a8", "int4"])
    reg.add_argument("--kv-quant", default="", choices=["", "int8"])
    vqa = subs.add_parser(
        "eval-vqa", help="VQA benchmark runners (MME/POPE/MMBench/SEED/"
        "ScienceQA/MM-Vet/jsonl suites)")
    vqa.add_argument("--benchmark", required=True)
    vqa.add_argument("--data", required=True,
                     help="benchmark file: MME root dir / POPE-SEED-"
                          "ScienceQA jsonl / MMBench tsv / MM-Vet json /"
                          " VQA-suite jsonl")
    vqa.add_argument("--imgs", default="",
                     help="image prefix (jsonl suites) or MME image root")
    vqa.add_argument("--ckpt", default=None)
    vqa.add_argument("--model-config", default=None)
    vqa.add_argument("--tokenizer", default=None)
    vqa.add_argument("--limit", type=int, default=None)
    vqa.add_argument("--tiny", action="store_true")
    vqa.add_argument("--max-new-tokens", type=int, default=None)
    vqa.add_argument("--gen-batch", type=int, default=1,
                     help="vectorize the benchmark decode: B prompts "
                          "left-padded into one compiled generate "
                          "(token-identical to bs=1, ~B× throughput)")
    vqa.add_argument("--quant", default="", choices=["", "int8", "w8a8", "int4"])
    vqa.add_argument("--kv-quant", default="", choices=["", "int8"])
    sv = subs.add_parser(
        "serve", help="HTTP serving front-end (POST /v1/generate)")
    sv.add_argument("--host", default="0.0.0.0")
    sv.add_argument("--port", type=int, default=8000)
    sv.add_argument("--ckpt", default=None)
    sv.add_argument("--model-config", default=None)
    sv.add_argument("--tokenizer", default=None)
    sv.add_argument("--tiny", action="store_true")
    sv.add_argument("--max-new-tokens", type=int, default=256)
    sv.add_argument("--max-prompt", type=int, default=1024)
    sv.add_argument("--conv", default="vicuna_v1")
    sv.add_argument("--max-batch", type=int, default=1,
                    help="micro-batch size: concurrent requests coalesce "
                         "into one [B]-vectorized decode")
    sv.add_argument("--batch-window-ms", type=float, default=4.0,
                    help="how long a non-full batch waits for company")
    sv.add_argument("--slots", type=int, default=0,
                    help="continuous batching: N decode slots; requests "
                         "join/leave the batch mid-decode (replaces "
                         "--max-batch/--spec-k)")
    sv.add_argument("--decode-span", type=int, default=1,
                    help="with --slots: tokens generated per device "
                         "call (amortizes host/relay round trips; "
                         "streaming/admission latency quantizes to the "
                         "span — 8 measured ~1.8x aggregate tok/s)")
    sv.add_argument("--prefill-chunk", type=int, default=0,
                    help="with --slots: admit prompts in C-token LLM "
                         "chunks, interleaving decode steps so a long "
                         "prompt stalls live streams by one chunk, not "
                         "the whole prefill")
    sv.add_argument("--max-queue", type=int, default=256,
                    help="waiting-request bound; beyond it the server "
                         "sheds load with HTTP 503")
    sv.add_argument("--sessions", type=int, default=0,
                    help="with --slots: park up to M finished chat "
                         "sessions' KV; a follow-up turn passing the "
                         "same \"session\" id prefills only its new "
                         "tokens (prefix KV reuse)")
    sv.add_argument("--session-chunk", type=int, default=64,
                    help="token window width for session extension")
    sv.add_argument("--max-ctx", type=int, default=None,
                    help="override the per-slot KV buffer length "
                         "(multi-turn sessions grow past "
                         "max_prompt+max_new_tokens)")
    sv.add_argument("--max-regions", type=int, default=8,
                    help="max visual-prompt regions per request "
                         "(region_boxes/region_masks in /v1/generate)")
    sv.add_argument("--perception", action="store_true",
                    help="also serve the perception endpoints "
                         "(POST /v1/detect, /v1/ground, /v1/pose) via "
                         "infer.Predictor on the same params")
    sv.add_argument("--sampling", action="store_true",
                    help="compile the temperature/top-p sampling path; "
                         "requests may then pass temperature/top_p/seed "
                         "(temperature 0 stays greedy)")
    sv.add_argument("--spec-k", type=int, default=0,
                    help="speculative decoding draft length (latency "
                         "mode, B=1 only; exact greedy — prompt-lookup "
                         "drafts + windowed forced-[EMB] runs)")
    sv.add_argument("--quant", default="", choices=["", "int8", "w8a8", "int4"])
    sv.add_argument("--kv-quant", default="", choices=["", "int8"])
    tr = subs.add_parser("train")
    tr.add_argument("--model-config", default=None)
    tr.add_argument("--data", required=True,
                    help="json list of dataset configs")
    tr.add_argument("--tokenizer", default=None)
    tr.add_argument("--output", default="output")
    tr.add_argument("--batch-size", type=int, default=8)
    tr.add_argument("--steps", type=int, default=1000)
    tr.add_argument("--num-workers", type=int, default=2,
                    help="prefetch loader threads (0 = synchronous)")
    tr.add_argument("--grad-accum", type=int, default=1,
                    help="micro-batches accumulated per optimizer step "
                         "(the reference's gradient_accumulation_steps); "
                         "--steps counts micro-batches")
    tr.add_argument("--remat", default="", choices=["", "dots", "full"],
                    help="rematerialize LLM decoder layers in the "
                         "backward pass (activation memory for FLOPs; "
                         "'dots' keeps matmul outputs)")
    tr.add_argument("--tiny", action="store_true")
    _dist_flags(tr)
    args = parser.parse_args(argv)
    _maybe_init_distributed(args)

    if args.cmd in ("eval-det", "eval-grd", "eval-pose", "eval-semseg",
                    "eval-interactive"):
        from visionllm_tpu.utils.simple_tokenizer import MockTokenizer
        cfg, model, params, tok, tid = _load_model_and_params(
            args, args.tiny)
        tok = tok or MockTokenizer()
        default_type = {"eval-det": "coco_det", "eval-grd": "refcoco_grd",
                        "eval-pose": "coco_pose", "eval-semseg": "semseg",
                        "eval-interactive": "coco_interactive"}[args.cmd]
        from visionllm_tpu.data.build import build_dataset
        results = {}
        for ds_cfg in _dataset_cfgs(args, default_type):
            ds_cfg = dict(ds_cfg)
            ds_cfg.setdefault("image_size", cfg.vis_encoder.image_size)
            if args.cmd == "eval-det":
                ds_cfg.setdefault(
                    "with_mask", getattr(args, "with_mask", False))
            name = ds_cfg.get("ann_file", ds_cfg["type"])
            ds = build_dataset(ds_cfg, tok)
            if params is None:
                params = _init_from_sample(model, ds[0], tid)
            if args.cmd == "eval-det":
                from visionllm_tpu.eval.eval_det import evaluate_det
                results[name] = evaluate_det(
                    model, params, ds, tid, limit=args.limit,
                    with_mask=ds_cfg.get("with_mask", False))
            elif args.cmd == "eval-grd":
                from visionllm_tpu.eval.eval_grd import evaluate_grd
                results[name] = evaluate_grd(model, params, ds, tid,
                                             limit=args.limit)
            elif args.cmd == "eval-semseg":
                from visionllm_tpu.eval.eval_semseg import evaluate_semseg
                results[name] = evaluate_semseg(model, params, ds, tid,
                                                limit=args.limit)
            elif args.cmd == "eval-interactive":
                from visionllm_tpu.eval.eval_interactive import \
                    evaluate_interactive
                results[name] = evaluate_interactive(model, params, ds,
                                                     tid, limit=args.limit)
            else:
                from visionllm_tpu.eval.eval_pose import evaluate_pose
                results[name] = evaluate_pose(model, params, ds, tid,
                                              limit=args.limit)
        print(json.dumps(results[name] if len(results) == 1
                         else results))
    elif args.cmd == "eval-vqa":
        from visionllm_tpu.utils.simple_tokenizer import MockTokenizer
        cfg, model, params, tok, tid = _load_model_and_params(
            args, args.tiny)
        tok = tok or MockTokenizer()
        from visionllm_tpu.eval import runners as R
        bench = args.benchmark
        if bench == "mme":
            rows = R.load_mme(args.data, args.imgs or None,
                              limit=args.limit)
        elif bench == "pope":
            rows = R.load_pope(args.data, args.imgs, limit=args.limit)
        elif bench == "mmbench":
            rows = R.load_mmbench(args.data, limit=args.limit)
        elif bench == "seed":
            rows = R.load_seed(args.data, args.imgs, limit=args.limit)
        elif bench == "scienceqa":
            rows = R.load_scienceqa(args.data, args.imgs,
                                    limit=args.limit)
        elif bench == "mmvet":
            rows = R.load_mmvet(args.data, args.imgs, limit=args.limit)
        elif bench == "caption":
            rows = R.load_caption(args.data, args.imgs, limit=args.limit)
        elif bench in R.VQA_SUITES:
            rows = R.load_vqa_jsonl(args.data, args.imgs,
                                    limit=args.limit)
        else:
            parser.error(f"unknown benchmark {bench} (known: mme, pope, "
                         f"mmbench, seed, scienceqa, mmvet, caption, "
                         f"{', '.join(R.VQA_SUITES)})")
        max_new = (args.max_new_tokens
                   or (30 if bench == "caption" else None)
                   or R.VQA_SUITES.get(bench, {}).get("max_new_tokens",
                                                      32))
        gen, cparams = _build_core_generate(cfg, params, tid, args.tiny,
                                            max_new, tok)
        res = R.run_benchmark(bench, gen, cparams, tok, rows,
                              image_size=cfg.vis_encoder.image_size,
                              batch_size=args.gen_batch)
        print(json.dumps(res))
    elif args.cmd == "eval-region":
        from visionllm_tpu.eval import region_eval as RE
        from visionllm_tpu.utils.simple_tokenizer import MockTokenizer
        cfg, model, params, tok, tid = _load_model_and_params(
            args, args.tiny)
        tok = tok or MockTokenizer()
        loader, _, default_max_new = RE.TASKS[args.task]
        kwargs = {"limit": args.limit}
        if args.task == "region-recognition":
            kwargs["vocab"] = args.vocab
        if args.task in ("region-caption", "region-recognition",
                         "region-classification"):
            kwargs["test_format"] = args.test_format
        rows = loader(args.ann, args.imgs, **kwargs)
        max_new = args.max_new_tokens or default_max_new
        gen, cparams = _build_core_generate(cfg, params, tid, args.tiny,
                                            max_new, tok)
        res = RE.run_region_eval(args.task, gen, cparams, tok, rows,
                                 image_size=cfg.vis_encoder.image_size)
        res.pop("predictions", None)
        print(json.dumps(res))
    elif args.cmd == "serve":
        import jax
        import jax.numpy as jnp
        from visionllm_tpu.serve import ChatService, serve
        from visionllm_tpu.utils.simple_tokenizer import MockTokenizer
        cfg, model, params, tok, tid = _load_model_and_params(
            args, args.tiny)
        tok = tok or MockTokenizer()
        svc = ChatService(
            cfg, None, tok, image_size=cfg.vis_encoder.image_size,
            conv_version=args.conv, max_new_tokens=args.max_new_tokens,
            max_prompt=args.max_prompt, max_batch=args.max_batch,
            batch_window_ms=args.batch_window_ms, spec_k=args.spec_k,
            slots=args.slots, prefill_chunk=args.prefill_chunk,
            decode_span=args.decode_span,
            sampling=args.sampling, max_queue=args.max_queue,
            sessions=args.sessions, session_chunk=args.session_chunk,
            max_ctx=args.max_ctx, max_regions=args.max_regions,
            dtype=jnp.float32 if args.tiny else jnp.bfloat16)
        if params is not None:
            svc.params = params["core"] if "core" in params else params
        else:
            # random-init smoke serving (no checkpoint); the probe
            # prompt includes a <region> token so RegionEncoder params
            # exist if region-prompted requests arrive
            size = cfg.vis_encoder.image_size
            img_len = (size // 14) ** 2
            ids = jnp.asarray([[1] + [svc.tid.imp] * img_len
                               + [svc.tid.reg, 5]], jnp.int32)
            regions = (jnp.ones((1, 1, size, size), jnp.float32)
                       if cfg.use_region_encoder else None)
            svc.params = svc.core.init(
                jax.random.PRNGKey(0), ids,
                jnp.zeros((1, size, size, 3), jnp.float32),
                svc.tid, regions=regions)["params"]
        predictor = None
        if args.perception:
            import numpy as np
            from visionllm_tpu.infer import Predictor
            from visionllm_tpu.models.composite import VisionLLMWithTools
            predictor = Predictor(
                cfg, params, tok,
                dtype=jnp.float32 if args.tiny else jnp.bfloat16)
            if params is None:
                # random-init smoke perception (no checkpoint): init the
                # composite incl. tool branches from a prepared sample
                img = np.zeros((48, 64, 3), np.uint8)
                arr = predictor._prepare(img, "<image>\nq", "a")
                init_args = (jax.random.PRNGKey(0), arr["input_ids"],
                             arr["image"], arr["image_aug"],
                             predictor.tid)
                p = predictor.model.init(
                    *init_args, pixel_mask=arr["pixel_mask"],
                    method=VisionLLMWithTools.infer_det)["params"]
                if cfg.use_unipose:
                    from visionllm_tpu.utils.checkpoint import (
                        merge_param_trees)
                    pose_p = predictor.model.init(
                        *init_args, 1, pixel_mask=arr["pixel_mask"],
                        method=VisionLLMWithTools.infer_pose)["params"]
                    p = merge_param_trees(p, pose_p)
                predictor.params = p
        serve(svc, args.host, args.port, predictor=predictor)
    elif args.cmd == "train":
        import jax.numpy as jnp
        from visionllm_tpu.config import tiny_test_config, vllm_7b_config
        from visionllm_tpu.models.visionllm import SpecialTokenIds
        from visionllm_tpu.train.runner import TrainConfig, Trainer
        cfg = tiny_test_config() if args.tiny else vllm_7b_config()
        if args.remat:
            import dataclasses
            cfg = dataclasses.replace(
                cfg, llm=dataclasses.replace(cfg.llm, remat=args.remat))
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
        from visionllm_tpu.train.train_step import OptimizerConfig
        tc = TrainConfig(output_dir=args.output,
                         batch_size=args.batch_size,
                         total_steps=args.steps,
                         num_workers=args.num_workers,
                         optimizer=OptimizerConfig(
                             grad_accum_steps=args.grad_accum))
        Trainer(cfg, tc, tid).train(ds_cfgs, tokenizer)
    else:
        parser.error(f"unknown command {args.cmd}")


if __name__ == "__main__":
    main()
