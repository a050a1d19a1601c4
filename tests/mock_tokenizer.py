from visionllm_tpu.utils.simple_tokenizer import MockTokenizer  # noqa: F401
