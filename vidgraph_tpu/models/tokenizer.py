"""Byte-level tokenizer — deterministic, no downloaded vocab.

The framework must run in zero-egress environments, so the captioner/text
models use raw UTF-8 bytes plus 3 specials.  256 byte ids, then PAD/BOS/EOS.
"""
from __future__ import annotations

from typing import List

import numpy as np

PAD_ID = 256
BOS_ID = 257
EOS_ID = 258
VOCAB_SIZE = 259


def encode(text: str, max_len: int = 0, add_bos: bool = True,
           add_eos: bool = True) -> List[int]:
    ids = list(text.encode("utf-8", errors="replace"))
    if add_bos:
        ids = [BOS_ID] + ids
    if add_eos:
        ids = ids + [EOS_ID]
    if max_len:
        ids = ids[:max_len]
    return ids


def decode(ids) -> str:
    out = bytearray()
    for i in ids:
        i = int(i)
        if i == EOS_ID:
            break
        if i < 256:
            out.append(i)
    return out.decode("utf-8", errors="replace")


def batch_encode(texts: List[str], max_len: int) -> np.ndarray:
    """Pad/truncate to [B, max_len] int32 with PAD_ID."""
    out = np.full((len(texts), max_len), PAD_ID, np.int32)
    for r, t in enumerate(texts):
        ids = encode(t, max_len=max_len)
        out[r, :len(ids)] = ids
    return out
