from visionllm_tpu.eval.benchmarks import BENCHMARK_METRICS
from visionllm_tpu.eval.caption import CiderD, bleu4
from visionllm_tpu.eval.coco_eval import CocoMAPEvaluator
from visionllm_tpu.eval.eval_det import evaluate_det
from visionllm_tpu.eval.eval_grd import evaluate_grd
from visionllm_tpu.eval.eval_interactive import evaluate_interactive
from visionllm_tpu.eval.eval_pose import OksMAPEvaluator, evaluate_pose, pck
from visionllm_tpu.eval.eval_semseg import (MIoUEvaluator, evaluate_semseg,
                                            sod_metrics)
from visionllm_tpu.eval.vqa import run_vqa
