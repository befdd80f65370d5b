from .tokenizer import tokenize, SimpleTokenizer  # noqa: F401
