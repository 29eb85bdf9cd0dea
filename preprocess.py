#!/usr/bin/env python
"""AISHELL-1 preprocessing CLI: extract archive, build manifests + vocab.

Parity with ``preprocess_aishell1.py:12-29`` (extract() + build()
pipeline), minus ``fire``:

    python preprocess.py pipeline --archive data_aishell.tgz --out data/
    python preprocess.py extract  --archive data_aishell.tgz --out data/
    python preprocess.py build    --root data/data_aishell --out data/
"""

from __future__ import annotations

import os
import sys

from asr_chinese_e2e_tpu.data.extract import extract_aishell1
from asr_chinese_e2e_tpu.data.manifest import AiShell1Collector
from asr_chinese_e2e_tpu.utils.cli import parse_kwargs


def extract(archive: str, out: str = "data/") -> str:
    root = extract_aishell1(archive, out)
    print(f"extracted to {root}")
    return root


def build(root: str, out: str = "data/", min_count: int = 1, max_vocab: int = 20000):
    collector = AiShell1Collector(root)
    for split, records in collector.items.items():
        print(f"{split}: {len(records)} utterances")
    vocab = collector.build_vocab(min_count=min_count, max_vocab=max_vocab)
    os.makedirs(out, exist_ok=True)
    vocab_path = os.path.join(out, "vocab.json")
    vocab.save(vocab_path)
    print(f"vocab: {vocab.vocab_size} tokens -> {vocab_path}")
    paths = collector.save(out)
    for split, path in paths.items():
        print(f"manifest[{split}] -> {path}")


def pipeline(archive: str, out: str = "data/", **kw):
    root = extract(archive, out)
    build(root, out, **kw)


def main():
    positional, kwargs = parse_kwargs(sys.argv[1:])
    cmd = positional[0] if positional else "pipeline"
    fn = {"extract": extract, "build": build, "pipeline": pipeline}.get(cmd)
    if fn is None:
        print(__doc__)
        sys.exit(1)
    fn(**kwargs)


if __name__ == "__main__":
    main()
