"""Q/A template banks for the perception tasks.

These are prompt-data constants from the reference (must match
byte-for-byte where eval uses them: test-mode always takes index 0 —
coco_llava.py:216-244). Sources: datasets/coco_llava.py:17-66 (det),
refcoco_llava.py (grd), unikpt_llava.py (pose), coco_interactive.py
(visual prompts).
"""

DET_QUESTIONS = [
    "Can you analyze the image and identify the <class> present?",
    "In this image, could you detect all instances of <class>?",
    "Are you capable of identifying <class> within this image?",
    "Could you please detect the objects you find that belong to the <class> category in the image?",
    "Can you perform object detection on the image and tell me the <class> you find?",
    "I'm trying to detect <class> in the image. Can you help me?",
    "Can you carry out object detection on this image and identify the <class> it contains?",
    "In the context of the image, I'd like to know which objects fall under the category of <class>. Is that something you can do?",
    "I have an image that needs examination for objects related to <class>. Can you perform that?",
    "Can you determine if there are any <class> present in the image using object detection?",
    "Could you please carry out object detection on this image and list any <class> that you discover?",
    "Could you help me identify the objects corresponding to <class> in the provided image?",
    "Are you capable of detecting and labeling <class> objects within the image?",
    "I'm curious about the objects in the image that correspond to the <class> category. Could you assist in finding them?",
    "Can you detect <class> within the image and provide information about its presence?",
    "Please examine the image and let me know which objects fall under the <class> category.",
    "Please perform object detection on this image for identifying <class>.",
    "I need your expertise to locate <class> in this image.",
    "Please let me know the objects falling into the <class> category in the image.",
    "Please help me identify objects falling under the <class> category in this image.",
    "Please assist me in identifying the <class> objects within the image.",
    "Please provide a breakdown of all the <class> objects visible in the image.",
    "Please analyze the image and let me know if you can find any objects categorized as <class>.",
    "I'm seeking your help in identifying <class> within the contents of the image.",
    "Please conduct object detection on the image to locate any <class> that may be present.",
    "Please execute object detection on this image and provide details about any <class> you detect.",
    "Please identify and list any <class> in the given image using object detection.",
    "Please analyze the image and let me know if there are any recognizable <class> objects.",
    "Detect any <class> in the given image, if possible.",
    "I need assistance in recognizing the <class> shown in the image.",
]

DET_YES = [
    "Yes, here are the results for <class> in the image.",
    "Certainly, the image shows the results for <class>.",
    "Absolutely, you can see the results for <class> in the image.",
    "Yes, the detection results for <class> are presented.",
    "Certainly, the image does show the results of <class>.",
    "Certainly, you can spot the results of <class> in the image.",
    "Yes, there is a clear depiction for the results of <class>.",
    "Of course, the image provides a comprehensive results of <class>.",
    "Absolutely, the image showcases the results of <class>.",
    "Sure, the image contains the detection results for <class>.",
]


def det_answer_tokens(num_embs: int) -> str:
    """The routing-token block appended per class: '[DET][EMB][EMB2]...'
    (coco_llava.py:230-238)."""
    if num_embs == 1:
        return "[DET][EMB]"
    return "[DET][EMB]" + "".join(f"[EMB{i}]" for i in range(2, num_embs + 1))


def grd_answer_tokens(num_embs: int) -> str:
    if num_embs == 1:
        return "[GRD][EMB]"
    return "[GRD][EMB]" + "".join(f"[EMB{i}]" for i in range(2, num_embs + 1))


def pose_answer_tokens(num_embs: int) -> str:
    if num_embs == 1:
        return "[POSE][EMB]"
    return "[POSE][EMB]" + "".join(
        f"[EMB{i}]" for i in range(2, num_embs + 1))


GRD_QUESTIONS = [
    "Where is \"<expr>\"?",
    "Can you locate \"<expr>\" in the image?",
    "Please find \"<expr>\" in the image.",
    "Where can I see \"<expr>\" in this image?",
]

GRD_ANSWERS = [
    "Sure, it is at <class>.",
    "It is located at <class>.",
    "Here: <class>.",
]

GEN_ANSWER = "[GEN]" + "[EMB]"
EDIT_ANSWER = "[EDIT]" + "[EMB]"


def gen_answer_tokens(num_embs_gen: int) -> str:
    """[GEN] followed by num_embs_gen repeated [EMB] (text2img.py:113 —
    gen/edit repeat the same [EMB] token, unlike perception)."""
    return "[GEN]" + "[EMB]" * num_embs_gen


def edit_answer_tokens(num_embs_gen: int) -> str:
    return "[EDIT]" + "[EMB]" * num_embs_gen
