"""Generate-and-freeze a CLIP-format BPE merges vocabulary.

The reference tokenizer loads OpenAI's `bpe_simple_vocab_16e6.txt.gz` from a
hard-coded disk path (reference src/lib/clip/simple_tokenizer.py:20); the
artifact is not shipped and this environment has no egress, so id-exact
OpenAI tokenization is impossible offline. Per the r3 VERDICT ("bundle it or
generate-and-freeze an equivalent"), this tool trains a byte-level BPE of the
same FORMAT (version-header line + one merge per line, gzipped; word-final
`</w>` symbols) on deterministic offline text and freezes the result at
`tcnerf/clip/bpe_frozen.txt.gz`, which the tokenizer loads by default.

Corpus (deterministic, offline):
  * the framework's own language-instruction distribution ("grasp the
    <color> ball", data/synthetic.py:233), heavily weighted — the strings
    this framework actually tokenizes segment into whole words;
  * English prose harvested from the Python standard library's docstrings
    (PEP-257 text is ordinary English; identifiers are filtered by the CLIP
    word regex and contribute subword statistics).

The FROZEN ARTIFACT is what matters: committing it pins token ids across
machines and rounds. Ids still differ from OpenAI's (unavoidable offline);
supplying the real file via $TCNERF_CLIP_BPE restores id-exact OpenAI
behavior and is covered by the env-gated goldens in
tests/test_tokenizer_golden.py.

Usage: python tools/freeze_bpe.py [--merges 16384] [--out path]
"""

from __future__ import annotations

import argparse
import ast
import collections
import gzip
import os
import sys
import sysconfig

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tcnerf.clip.tokenizer import _PATTERN, bytes_to_unicode, whitespace_clean


def stdlib_docstrings(limit_files: int = 4000):
    """English text from the Python stdlib's docstrings (deterministic)."""
    stdlib = sysconfig.get_paths()["stdlib"]
    texts = []
    names = []
    for root, dirs, files in os.walk(stdlib):
        # skip vendored/test trees with long non-English blobs
        dirs[:] = sorted(d for d in dirs
                         if d not in ("test", "tests", "idle_test",
                                      "site-packages", "__pycache__"))
        for f in sorted(files):
            if f.endswith(".py"):
                names.append(os.path.join(root, f))
    for path in names[:limit_files]:
        try:
            with open(path, encoding="utf-8", errors="ignore") as f:
                tree = ast.parse(f.read())
        except (SyntaxError, ValueError):
            continue
        for node in ast.walk(tree):
            if isinstance(node, (ast.Module, ast.FunctionDef,
                                 ast.AsyncFunctionDef, ast.ClassDef)):
                doc = ast.get_docstring(node)
                if doc:
                    texts.append(doc)
    return texts


def domain_instructions():
    """The framework's own instruction distribution (data/synthetic.py:233)."""
    colors = ["red", "green", "blue", "yellow", "magenta", "cyan", "white",
              "gray", "grey", "black", "orange", "purple", "pink", "brown"]
    objs = ["ball", "cube", "block", "sphere", "box", "object", "toy",
            "bottle", "can", "cup"]
    verbs = ["grasp", "pick up", "grab", "lift", "take", "fetch", "pick"]
    out = []
    for v in verbs:
        for c in colors:
            for o in objs:
                out.append(f"{v} the {c} {o}")
    return out


def word_frequencies(texts, weights):
    be = bytes_to_unicode()
    freq = collections.Counter()
    for text, w in zip(texts, weights):
        text = whitespace_clean(text).lower()
        for token in _PATTERN.findall(text):
            tok = "".join(be[b] for b in token.encode("utf-8"))
            freq[tok] += w
    return freq


def train_bpe(freq, n_merges):
    """Classic BPE training with incremental pair-count maintenance."""
    words = []     # list of (symbols list, count)
    for tok, count in freq.items():
        if len(tok) < 1:
            continue
        sym = list(tok[:-1]) + [tok[-1] + "</w>"]
        words.append([sym, count])

    pair_counts = collections.Counter()
    pair_words = collections.defaultdict(set)  # pair -> word indices
    for wi, (sym, count) in enumerate(words):
        for a, b in zip(sym, sym[1:]):
            pair_counts[(a, b)] += count
            pair_words[(a, b)].add(wi)

    merges = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # deterministic tie-break: count desc, then lexicographic
        best = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        for wi in list(pair_words[best]):
            sym, count = words[wi]
            i = 0
            while i < len(sym) - 1:
                if sym[i] == best[0] and sym[i + 1] == best[1]:
                    left = sym[i - 1] if i > 0 else None
                    right = sym[i + 2] if i + 2 < len(sym) else None
                    # retire old pairs
                    for p in ((left, sym[i]) if left else None,
                              (sym[i], sym[i + 1]),
                              (sym[i + 1], right) if right else None):
                        if p:
                            pair_counts[p] -= count
                            if pair_counts[p] <= 0:
                                del pair_counts[p]
                                pair_words.pop(p, None)
                    sym[i:i + 2] = [new_sym]
                    # add new pairs
                    for p in ((left, new_sym) if left else None,
                              (new_sym, sym[i + 1]) if i + 1 < len(sym)
                              else None):
                        if p:
                            pair_counts[p] += count
                            pair_words[p].add(wi)
                else:
                    i += 1
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
        if len(merges) % 2000 == 0:
            print(f"  {len(merges)} merges...", flush=True)
    return merges


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--merges", type=int, default=16384)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tcnerf", "clip", "bpe_frozen.txt.gz"))
    args = ap.parse_args()

    domain = domain_instructions()
    docs = stdlib_docstrings()
    print(f"corpus: {len(domain)} domain instructions (weight 1000), "
          f"{len(docs)} stdlib docstrings (weight 1)")
    texts = domain + docs
    weights = [1000] * len(domain) + [1] * len(docs)
    freq = word_frequencies(texts, weights)
    print(f"unique words: {len(freq)}")
    merges = train_bpe(freq, args.merges)
    print(f"trained {len(merges)} merges")

    lines = ["#version: 0.2 — tcnerf frozen vocabulary "
             "(tools/freeze_bpe.py; NOT OpenAI's bpe_simple_vocab_16e6)"]
    lines += [f"{a} {b}" for a, b in merges]
    with gzip.open(args.out, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out} ({os.path.getsize(args.out)} bytes)")


if __name__ == "__main__":
    main()
