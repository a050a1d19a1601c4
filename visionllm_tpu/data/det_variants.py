"""Detection dataset variants over other sources.

Behavioral references (one class per reference file, same conversation/
target machinery as CocoDetDataset → coco_llava.py):

* GenericDetDataset  — datasets/det_llava.py:83-98 (COCO-format files
  for Objects365 etc.; classes read from the annotation categories and
  normalized strip+lower per :229; `dataset_name` is a ctor arg).
* OdinwDetDataset    — datasets/odinw_llava.py:9-36 (classes from the
  annotation file's categories; dataset_name "odinw").
* CrowdHumanDetDataset — datasets/crowdhuman_llava.py:7-32 (single
  class "person").
* CodDetDataset      — datasets/cod_llava.py:73-86,251-252 (camouflage
  object detection: single class "camouflage object", instance masks).
* SodDetDataset      — datasets/sod_llava.py:253-258 (salient object
  detection: train randomly names the class "forground object" or
  "salient object" [sic — string kept byte-identical for prompt
  parity], test always "forground object"; instance masks).

All emit task="det" so the TaskGroupedBatchSampler routes them to the
gdino step, matching the reference's tool grouping
(visionllmv2_trainer.py:216-231).
"""

from __future__ import annotations

from typing import List

from visionllm_tpu.data.build import register_dataset
from visionllm_tpu.data.det_dataset import CocoDetDataset


@register_dataset("det_generic")
class GenericDetDataset(CocoDetDataset):
    """COCO-format detection over arbitrary sources (Objects365, ...)."""

    task = "det"
    _normalize_names = True

    def __init__(self, *args, dataset_name: str = "objects365", **kw):
        super().__init__(*args, **kw)
        self.dataset_name = dataset_name


@register_dataset("odinw_det")
class OdinwDetDataset(CocoDetDataset):
    """ODinW: per-dataset class vocabulary from the annotation file."""

    task = "det"
    dataset_name = "odinw"
    _normalize_names = True


@register_dataset("crowdhuman_det")
class CrowdHumanDetDataset(CocoDetDataset):
    task = "det"
    dataset_name = "crowdhuman"
    _classes = ["person"]


class _SingleClassDetDataset(CocoDetDataset):
    """Single-query det (COD/SOD): the conversation always asks about
    one class, so every annotation maps to answer slot 0."""

    def __init__(self, *args, with_mask: bool = True, **kw):
        super().__init__(*args, with_mask=with_mask, **kw)

    def _class_name(self) -> str:
        raise NotImplementedError

    def _build_class_list(self, gt_labels) -> List[str]:
        return [self._class_name()]

    def _id2index(self, class_list):
        # one class, one answer slot — even when the train-time prompt
        # renames it ("salient object"), every annotated object IS the
        # single foreground/camouflage query, so all category ids map
        # to slot 0
        return {i: 0 for i in range(len(self.coco.class_names))}


@register_dataset("cod_det")
class CodDetDataset(_SingleClassDetDataset):
    task = "det"
    dataset_name = "cod"
    _classes = ["camouflage object"]

    def _class_name(self) -> str:
        return "camouflage object"


@register_dataset("sod_det")
class SodDetDataset(_SingleClassDetDataset):
    task = "det"
    dataset_name = "sod"
    # test-time name; train randomly swaps in "salient object"
    # (sod_llava.py:253-255 — "forground" typo preserved for parity)
    _classes = ["forground object"]

    def __init__(self, *args, dataset_name: str = "sod", **kw):
        super().__init__(*args, **kw)
        self.dataset_name = dataset_name

    def _class_name(self) -> str:
        if self.test_mode:
            return "forground object"
        return self.rng.choice(["forground object", "salient object"])
