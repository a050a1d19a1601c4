"""Special-token vocabulary for the super-link routing protocol.

The reference defines these in visionllmv2/constant.py:14-48; the token
*strings* must match exactly so that prompts built for the reference
checkpoint tokenize identically.
"""

IGNORE_INDEX = -100
IMAGE_TOKEN_INDEX = -200

DEFAULT_IMAGE_TOKEN = "<image>"
DEFAULT_IMAGE_PATCH_TOKEN = "<im_patch>"

# Ordered dict of all special tokens added to the tokenizer. Order matters:
# the reference adds them in this order, so token ids of the released
# checkpoint depend on it (visionllmv2/train/train.py:350-354).
DEFAULT_TOKENS = {
    "pad": "[PAD]",
    "bos": "<s>",
    "eos": "</s>",
    "unk": "<unk>",
    # placeholders
    "img": "<image>",
    "imp": "<im_patch>",
    "reg": "<region>",
    # span markers
    "boi": "<img>",
    "eoi": "</img>",
    "sor": "<reg>",
    "eor": "</reg>",
    "sod": "<det>",
    "eod": "</det>",
    "sog": "<grd>",
    "eog": "</grd>",
    # atom-tool routing tokens
    "det": "[DET]",
    "grd": "[GRD]",
    "seg": "[SEG]",
    "pose": "[POSE]",
    "gen": "[GEN]",
    "edit": "[EDIT]",
    # learnable query-embedding slots ([EMB] is also the id base for the
    # contiguous [EMB]..[EMB8] range)
    "emb": "[EMB]",
    "emb2": "[EMB2]",
    "emb3": "[EMB3]",
    "emb4": "[EMB4]",
    "emb5": "[EMB5]",
    "emb6": "[EMB6]",
    "emb7": "[EMB7]",
    "emb8": "[EMB8]",
}

# Tool kinds used by the routing machinery (order is the wire format for
# the decode loop's emb-countdown state machine).
TOOL_NONE = 0
TOOL_DET = 1   # [DET]/[SEG]/[GRD] -> grounding-dino
TOOL_POSE = 2  # [POSE]           -> unipose
TOOL_GEN = 3   # [GEN]            -> stable-diffusion
TOOL_EDIT = 4  # [EDIT]           -> instruct-pix2pix
