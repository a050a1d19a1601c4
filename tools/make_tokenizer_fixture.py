"""Build the committed tiny real-subword tokenizer fixture
(tests/fixtures/tiny_tokenizer/).

The reference trains/loads a SentencePiece Llama tokenizer and adds the
26 DEFAULT_TOKENS as special tokens (train/train.py:339-354). The
sentencepiece trainer is not available offline, so this trains the same
algorithm family — a Unigram model with Metaspace (▁) pre-tokenization,
dummy-prefix 'always' (the slow/legacy Llama behavior), BOS-prepending
post-processor — with HF `tokenizers`, which LlamaTokenizerFast uses as
its backend. That reproduces the merge-boundary behavior the label-mask
arithmetic (llava_data.py:278-535) depends on: multi-char subwords,
leading-▁ pieces, mid-string retokenization differences.

Run from the repo root:  python tools/make_tokenizer_fixture.py
(deterministic: fixed corpus, fixed vocab size — safe to re-run).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tokenizers import Tokenizer, decoders, models, pre_tokenizers, processors, trainers  # noqa: E501

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "tiny_tokenizer")

# corpus: the conversation-template boilerplate + prompt vocabulary the
# preprocessing tests exercise, so the trained merges are realistic
CORPUS = [
    "A chat between a curious user and an artificial intelligence "
    "assistant. The assistant gives helpful, detailed, and polite "
    "answers to the user's questions.",
    "USER: ASSISTANT: ",
    "What is shown in this image?",
    "Please detect the person and the dog in the picture.",
    "Can you provide me with a brief description of the region "
    "in the picture?",
    "Sure, the category is cat.",
    "There is a red block on the wooden table next to a sleeping cat.",
    "The image shows two people walking a dog in the park.",
    "What is the category of this region? Using only one word or phrase.",
    "Whis is the object category? Answer with the category name from "
    "COCO-80, and use single word or phrase.",
    "You are an AI assistant whose name is InternLM.",
    "Describe the photo briefly. A man riding a bicycle down the street.",
    "Detect all objects: person, dog, cat, car, chair, table, bird.",
    # the closure arithmetic (cur_len == total_len, llava_data.py:
    # 322-363, 452-488) holds on real vocabs because boundary words
    # exist both as '▁X' (isolated, dummy-prefixed) and 'X' (mid-string
    # after a role marker's '\n') single pieces — give the trainer both
    # contexts so the tiny vocab has the same property
    "assistant\nSure, the category is cat.",
    "assistant\nThere is a red block.",
    "assistant\nA man riding a bicycle.",
    "user\nWhat is the category?",
    "user\nPlease detect the person.",
    "user\nCan you provide me with a brief description?",
] * 4


def main():
    tok = Tokenizer(models.Unigram())
    # 'always' dummy-prefix = the slow/legacy Llama SentencePiece
    # behavior the reference arithmetic assumes (tokenizer.legacy=True)
    tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="always")
    tok.decoder = decoders.Metaspace(replacement="▁",
                                     prepend_scheme="always")
    # initial_alphabet guarantees single-char coverage for characters the
    # prompts contain — the real Llama tokenizer never emits <unk>
    # (byte fallback), and preprocess_v1's total_len counts non-PAD
    # tokens with pad==unk, so an <unk> in the stream breaks the
    # cur_len==total_len closure check (llava_data.py:322-363)
    alphabet = sorted(set("".join(CORPUS) + "\n<>[]/_|{}()0123456789"
                       # internlm2_chat system prompt chars
                       + "书生·浦语"))
    trainer = trainers.UnigramTrainer(
        vocab_size=2000, special_tokens=["<unk>", "<s>", "</s>"],
        unk_token="<unk>", initial_alphabet=alphabet)
    tok.train_from_iterator(CORPUS + ["line one\nline two\nline three\n"] * 4,
                            trainer=trainer)

    # Symmetrize the vocab: real SentencePiece vocabs (Llama, InternLM2)
    # carry most word pieces BOTH as '▁X' (word-initial) and 'X'
    # (mid-word / after a non-space boundary) — that symmetry is what
    # makes the reference's isolated-vs-in-context token-count closure
    # (cur_len == total_len) hold. A 200-piece trained vocab lacks it,
    # so mirror every piece into both forms at the same score.
    import json
    spec = json.loads(tok.to_str())
    vocab = spec["model"]["vocab"]          # list of [piece, logprob]
    have = {p for p, _ in vocab}
    extra = []
    for piece, score in vocab:
        if piece in ("<unk>", "<s>", "</s>"):
            continue
        if piece.startswith("▁") and len(piece) > 1:
            twin = piece[1:]
        elif not piece.startswith("▁"):
            twin = "▁" + piece
        else:
            continue
        if twin not in have:
            have.add(twin)
            extra.append([twin, score])
    spec["model"]["vocab"] = vocab + extra
    tok = Tokenizer.from_str(json.dumps(spec))
    tok.post_processor = processors.TemplateProcessing(
        single="<s> $A", pair="<s> $A <s> $B",
        special_tokens=[("<s>", tok.token_to_id("<s>"))])

    from transformers import PreTrainedTokenizerFast
    wrapper = PreTrainedTokenizerFast(
        tokenizer_object=tok, bos_token="<s>", eos_token="</s>",
        unk_token="<unk>", model_max_length=4096, padding_side="right",
        # the internlm2 tokenizer carries the chat-role markers as
        # special tokens (single ids); the internlm2_chat masking
        # arithmetic relies on that
        additional_special_tokens=["<|im_start|>", "<|im_end|>"])
    os.makedirs(OUT, exist_ok=True)
    wrapper.save_pretrained(OUT)
    print(f"saved fixture to {OUT}: vocab={wrapper.vocab_size}")


if __name__ == "__main__":
    main()
