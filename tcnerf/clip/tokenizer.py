"""CLIP byte-level BPE tokenizer.

Semantics match OpenAI CLIP's SimpleTokenizer (the reference vendors it at
src/lib/clip/simple_tokenizer.py and wraps it in tokenize(),
src/lib/clip/utils.py:105-155): byte->unicode mapping, word-final `</w>`
markers, greedy lowest-rank pair merging, 77-token context with SOT/EOT.

The BPE merges file (`bpe_simple_vocab_16e6.txt.gz`) is an external artifact
the reference loads from a hard-coded disk path (simple_tokenizer.py:20) and
does not ship. Supply it via the `bpe_path` argument or $TCNERF_CLIP_BPE to
get id-exact OpenAI tokenization (env-gated goldens in
tests/test_tokenizer_golden.py validate that path).

Without it, the bundled FROZEN vocabulary `bpe_frozen.txt.gz` is used — a
byte-level BPE of the same format trained offline on deterministic text
(tools/freeze_bpe.py) and committed, so token ids are stable across machines
and rounds (`is_frozen_vocab=True`). Ids differ from OpenAI's (the artifact
is unobtainable offline) but the embedding-table size (49408) and special
ids (SOT 49406, EOT 49407) are identical, so models train/serve identically.

If an explicitly requested file is missing, a last-resort *byte-level*
vocabulary (256 bytes + 256 word-final bytes, no merges) is used with a loud
warning and `is_fallback_vocab=True`.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
from typing import List, Union

import numpy as np

try:
    import regex as _re
    _HAS_REGEX = True
except ImportError:  # pragma: no cover
    import re as _re
    _HAS_REGEX = False

VOCAB_SIZE = 49408
SOT_TOKEN = 49406
EOT_TOKEN = 49407
CONTEXT_LENGTH = 77


@functools.lru_cache()
def bytes_to_unicode():
    """Reversible byte <-> printable-unicode mapping (GPT-2/CLIP standard)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def whitespace_clean(text: str) -> str:
    text = _re.sub(r"\s+", " ", text)
    return text.strip()


def basic_clean(text: str) -> str:
    try:
        import ftfy
        text = ftfy.fix_text(text)
    except ImportError:
        pass
    return html.unescape(html.unescape(text))


if _HAS_REGEX:
    _PATTERN = _re.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
        r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
        _re.IGNORECASE,
    )
else:
    _PATTERN = _re.compile(
        r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
        r"""[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+""",
        _re.IGNORECASE,
    )


FROZEN_BPE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bpe_frozen.txt.gz")


class SimpleTokenizer:
    def __init__(self, bpe_path: str = None):
        explicit = bpe_path or os.environ.get("TCNERF_CLIP_BPE")
        bpe_path = explicit or FROZEN_BPE
        self.is_frozen_vocab = not explicit and os.path.exists(FROZEN_BPE)
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        base = list(bytes_to_unicode().values())
        vocab = base + [v + "</w>" for v in base]

        if bpe_path and os.path.exists(bpe_path):
            opener = gzip.open if bpe_path.endswith(".gz") else open
            with opener(bpe_path, "rt", encoding="utf-8") as f:
                merges = f.read().split("\n")
            merges = merges[1:49152 - 256 - 2 + 1]
            merges = [tuple(m.split()) for m in merges]
            vocab.extend("".join(m) for m in merges)
            self.is_fallback_vocab = False
        else:
            merges = []
            self.is_fallback_vocab = True
            import warnings
            warnings.warn(
                "CLIP BPE merges file not found (bpe_path/$TCNERF_CLIP_BPE): "
                "using the byte-level fallback vocabulary. Token ids will NOT "
                "match OpenAI CLIP — supply bpe_simple_vocab_16e6.txt.gz for "
                "id-exact tokenization.", stacklevel=2)

        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.encoder["<|startoftext|>"] = SOT_TOKEN
        self.encoder["<|endoftext|>"] = EOT_TOKEN
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        result = " ".join(word)
        self.cache[token] = result
        return result

    def encode(self, text: str) -> List[int]:
        tokens = []
        text = whitespace_clean(basic_clean(text)).lower()
        for token in _re.findall(_PATTERN, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            tokens.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return tokens

    def decode(self, tokens) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        data = bytearray(self.byte_decoder[c] for c in text
                         if c in self.byte_decoder)
        return data.decode("utf-8", errors="replace").replace("</w>", " ")


@functools.lru_cache()
def _default_tokenizer() -> SimpleTokenizer:
    return SimpleTokenizer()


def tokenize(texts: Union[str, List[str]], context_length: int = CONTEXT_LENGTH,
             truncate: bool = False, tokenizer: SimpleTokenizer = None) -> np.ndarray:
    """Tokenize to [n_texts, context_length] int32 with SOT/EOT framing.

    Reference: src/lib/clip/utils.py:105-155.
    """
    if isinstance(texts, str):
        texts = [texts]
    tk = tokenizer or _default_tokenizer()
    all_tokens = [[SOT_TOKEN] + tk.encode(t) + [EOT_TOKEN] for t in texts]
    result = np.zeros((len(all_tokens), context_length), dtype=np.int32)
    for i, tokens in enumerate(all_tokens):
        if len(tokens) > context_length:
            if truncate:
                tokens = tokens[:context_length]
                tokens[-1] = EOT_TOKEN
            else:
                raise RuntimeError(
                    f"Input {texts[i]!r} is too long for context length "
                    f"{context_length}")
        result[i, :len(tokens)] = tokens
    return result
