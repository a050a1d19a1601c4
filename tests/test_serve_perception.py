"""Perception endpoints (/v1/detect, /v1/ground, /v1/pose) over a real
socket: the HTTP layer must return JSON-safe results identical to the
Predictor's, RLE-encode masks, and 400 on bad/unconfigured requests."""

import base64
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.mock_tokenizer import MockTokenizer
from visionllm_tpu.config import tiny_test_config
from visionllm_tpu.infer import Predictor
from visionllm_tpu.models.composite import VisionLLMWithTools
from visionllm_tpu.ops.rle import rle_decode
from visionllm_tpu.serve import ChatService, make_server


from visionllm_tpu.utils.checkpoint import merge_param_trees as _merge


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config(use_sd=False, use_ip2p=False,
                           use_region_encoder=False)
    tok = MockTokenizer()
    pred = Predictor(cfg, None, tok, dtype=jnp.float32,
                     test_scale=(48, 64), buckets=((64, 64),))
    pred.model = VisionLLMWithTools(cfg, dtype=jnp.float32,
                                    tool_dtype=jnp.float32)
    img = np.random.RandomState(0).randint(0, 255, (48, 64, 3), np.uint8)
    arr = pred._prepare(img, "<image>\nq", "a")
    det_p = pred.model.init(
        jax.random.PRNGKey(0), arr["input_ids"], arr["image"],
        arr["image_aug"], pred.tid, pixel_mask=arr["pixel_mask"],
        method=VisionLLMWithTools.infer_det)["params"]
    pose_p = pred.model.init(
        jax.random.PRNGKey(0), arr["input_ids"], arr["image"],
        arr["image_aug"], pred.tid, 1, pixel_mask=arr["pixel_mask"],
        method=VisionLLMWithTools.infer_pose)["params"]
    pred.params = _merge(jax.device_get(det_p), jax.device_get(pose_p))

    chat_cfg = tiny_test_config(use_gdino=False, use_unipose=False,
                                use_sd=False, use_ip2p=False,
                                use_region_encoder=False)
    svc = ChatService(chat_cfg, None, tok,
                      image_size=chat_cfg.vis_encoder.image_size,
                      max_new_tokens=4, max_prompt=128,
                      dtype=jnp.float32)
    size = chat_cfg.vis_encoder.image_size
    ids = jnp.asarray([[1] + [svc.tid.imp] * (size // 14) ** 2 + [5]],
                      jnp.int32)
    svc.params = svc.core.init(
        jax.random.PRNGKey(0), ids,
        jnp.zeros((1, size, size, 3), jnp.float32), svc.tid)["params"]

    srv = make_server(svc, port=0, predictor=pred)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{port}", pred, img
    srv.shutdown()


def _post(url, obj, timeout=300):
    req = urllib.request.Request(
        url, json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _img_req(img, **kw):
    return {"image_b64": base64.b64encode(img.tobytes()).decode(),
            "image_shape": list(img.shape), **kw}


def test_detect_endpoint_matches_predictor(setup):
    url, pred, img = setup
    code, out = _post(url + "/v1/detect",
                      _img_req(img, classes=["cat", "dog"],
                               threshold=0.0, topk=5))
    assert code == 200, out
    want = pred.detect(img, ["cat", "dog"], threshold=0.0, topk=5)
    np.testing.assert_allclose(out["scores"], want["scores"], atol=1e-4)
    np.testing.assert_allclose(out["boxes"], want["boxes"], atol=1e-3)
    assert out["class_names"] == want["class_names"]


def test_detect_endpoint_masks_rle(setup):
    url, pred, img = setup
    code, out = _post(url + "/v1/detect",
                      _img_req(img, classes=["cat"], threshold=0.0,
                               topk=3, with_mask=True))
    assert code == 200, out
    want = pred.detect(img, ["cat"], threshold=0.0, topk=3,
                       with_mask=True)
    assert len(out["masks"]) == 3
    m0 = rle_decode(out["masks"][0]["counts"],
                    *out["masks"][0]["size"])
    np.testing.assert_array_equal(m0.astype(bool), want["masks"][0])


def test_ground_endpoint(setup):
    url, pred, img = setup
    code, out = _post(url + "/v1/ground",
                      _img_req(img, expression="the left thing"))
    assert code == 200, out
    want = pred.ground(img, "the left thing")
    np.testing.assert_allclose(out["box"], want["box"], atol=1e-3)
    assert abs(out["score"] - want["score"]) < 1e-4


def test_pose_endpoint(setup):
    url, pred, img = setup
    names = ["nose", "left eye", "right eye", "left ear"]
    code, out = _post(url + "/v1/pose",
                      _img_req(img, keypoint_names=names,
                               threshold=0.0, topk=4))
    assert code == 200, out
    assert np.asarray(out["keypoints"]).shape == (4, 4, 3)
    assert out["keypoint_names"] == names


def test_bad_request_400(setup):
    url, _, img = setup
    code, out = _post(url + "/v1/detect", _img_req(img))  # no classes
    assert code == 400 and "classes" in out["error"]
    code, out = _post(url + "/v1/detect", {"classes": ["x"]})  # no image
    assert code == 400


def test_unconfigured_perception_400():
    cfg = tiny_test_config(use_gdino=False, use_unipose=False,
                           use_sd=False, use_ip2p=False,
                           use_region_encoder=False)
    svc = ChatService(cfg, None, MockTokenizer(),
                      image_size=cfg.vis_encoder.image_size,
                      max_new_tokens=2, max_prompt=64,
                      dtype=jnp.float32)
    srv = make_server(svc, port=0)   # no predictor
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    img = np.zeros((8, 8, 3), np.uint8)
    code, out = _post(f"http://127.0.0.1:{port}/v1/detect",
                      _img_req(img, classes=["x"]))
    srv.shutdown()
    assert code == 400 and "perception" in out["error"]
