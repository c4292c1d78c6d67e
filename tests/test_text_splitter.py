"""Token-splitter parity vs the committed reference run (VERDICT r1 item 5).

The reference split each 3-caption batch with tiktoken's
TokenTextSplitter(296, 16); the per-batch chunk counts are recoverable
from the committed export's chunk ids (``{uuid}_{batch}_{i}``).  The
calibrated estimator must reproduce those counts for >=90% of the 72
batches and never be off by more than one chunk — chunk ids (and hence
source-chunk attribution) then match the reference run wherever counts
agree.
"""
import collections
import json
import re
from pathlib import Path

import pytest

from vidgraph_tpu.pipeline.text_splitter import (TokenTextSplitter,
                                                 estimate_token_count,
                                                 make_splitter)

REF = Path("/root/reference/data")


def test_split_windows_and_overlap():
    sp = TokenTextSplitter(chunk_size=40, chunk_overlap=8)
    text = " ".join(f"word{i}" for i in range(200))
    chunks = sp.split_text(text)
    assert len(chunks) > 2
    # every chunk is an exact substring (nothing invented or lost inside)
    for c in chunks:
        assert c in text
    # consecutive chunks overlap (shared text at the boundary)
    for a, b in zip(chunks, chunks[1:]):
        tail = a[-20:]
        assert tail.split()[0] in b


def test_split_empty_and_tiny():
    sp = TokenTextSplitter()
    assert sp.split_text("") == []
    assert sp.split_text("hi") == ["hi"]


def test_estimate_reasonable_for_english():
    # ~0.75 words/token for common English -> 100 words ~ 130 tokens;
    # the estimate should land in a sane band, not at word or char count
    text = ("the person in the laboratory carefully measures the white "
            "powder on the analytical balance " * 10)
    words = len(text.split())
    est = estimate_token_count(text)
    assert words * 0.9 <= est <= words * 1.8


@pytest.mark.skipif(not REF.exists(), reason="reference data not mounted")
def test_per_batch_chunk_count_parity_vs_committed_run():
    export = json.load(open(
        REF / "exports" / "mvp_93e9c82e-95d6-4864-8ac1-2ae70edfd961.json"))
    true_counts = collections.Counter()
    for n in export["nodes"]:
        if "Chunk" in n.get("labels", []):
            m = re.match(r".*_(\d+)_(\d+)$", n["properties"].get("id", ""))
            if m:
                true_counts[int(m.group(1))] += 1
    vlm = json.load(open(REF / "outputs" / "vlm_output.json"))["results"]
    sp = TokenTextSplitter(chunk_size=296, chunk_overlap=16)
    exact = 0
    for b in range(72):
        items = vlm[b * 3:(b + 1) * 3]
        text = "\n\n".join(f"Time: {it['time']}\nContent: {it['content']}"
                           for it in items)
        got = len(sp.split_text(text))
        assert abs(got - true_counts[b]) <= 1, \
            f"batch {b}: got {got}, reference {true_counts[b]}"
        exact += got == true_counts[b]
    assert exact >= 65, f"only {exact}/72 exact"


def test_tiktoken_terminal_break_no_extra_overlapped_chunk():
    """ADVICE r2 (medium): when the token count lands exactly on a window
    edge (stride < n_tokens <= chunk_size), the tiktoken path must NOT
    emit an extra fully-overlapped trailing chunk — mirroring LangChain's
    split_text_on_tokens terminal break.  Exercised with a fake encoder so
    the guard is tested even without tiktoken installed."""
    sp = TokenTextSplitter(chunk_size=10, chunk_overlap=4)

    class _FakeEnc:
        def encode(self, text):
            return list(range(len(text.split())))

        def decode(self, ids):
            return " ".join(f"w{i}" for i in ids)

    sp._tiktoken = _FakeEnc()
    # 10 tokens == chunk_size: exactly one window, not two
    chunks = sp.split_text(" ".join(["x"] * 10))
    assert len(chunks) == 1
    # 8 tokens: stride(6) < 8 <= chunk_size(10) -> still one window
    assert len(sp.split_text(" ".join(["x"] * 8))) == 1
    # 16 tokens == stride + chunk_size: second window ends at last token
    assert len(sp.split_text(" ".join(["x"] * 16))) == 2
    # 17 tokens: needs a third window
    assert len(sp.split_text(" ".join(["x"] * 17))) == 3


def test_estimator_and_tiktoken_paths_agree_on_break_semantics():
    """Both paths compute chunk count as ceil((n-size)/stride)+1."""
    sp = TokenTextSplitter(chunk_size=40, chunk_overlap=8)
    text = " ".join(f"word{i}" for i in range(200))
    chunks, margin = sp.split_text_with_margin(text)
    assert chunks == sp.split_text(text)
    assert sp.chunk_overlap < margin <= sp.chunk_size


def test_near_boundary_parity_warning(caplog):
    """VERDICT r2 item 9: the estimator path warns when a batch's token
    count sits within a few tokens of a chunk-window boundary, and stays
    quiet when it is comfortably inside a window."""
    import logging

    from vidgraph_tpu.pipeline.pre_injector import warn_near_window_boundary

    sp = TokenTextSplitter(chunk_size=20, chunk_overlap=4)
    assert sp.encoder_name == "estimator"
    # find one near-boundary text and one comfortably-inside text
    hit = safe = None
    for n in range(8, 200):
        text = " ".join(f"word{i}" for i in range(n))
        chunks, margin = sp.split_text_with_margin(text)
        if len(chunks) < 2:
            continue
        slack = min(margin - 4, 20 - margin)
        if slack <= 6 and hit is None:
            hit = (chunks, margin)
        if slack > 6 and safe is None:
            safe = (chunks, margin)
        if hit and safe:
            break
    assert hit is not None and safe is not None
    # return value is the contract (project loggers don't propagate to
    # root, so caplog can't see the record; the message is in stderr)
    assert warn_near_window_boundary(sp, *hit, batch_idx=3) is True
    assert warn_near_window_boundary(sp, *safe, batch_idx=4) is False
    # a tiktoken-style exact splitter must never warn
    sp2 = TokenTextSplitter(chunk_size=20, chunk_overlap=4)
    sp2._tiktoken = object()
    assert sp2.encoder_name == "tiktoken"
    assert warn_near_window_boundary(sp2, *hit, batch_idx=5) is False


def test_make_splitter_word_fallback():
    from vidgraph_tpu.pipeline.pre_injector import split_text_by_words

    sp = make_splitter("word", 296, 16, word_splitter=split_text_by_words)
    text = " ".join(f"w{i}" for i in range(500))
    assert sp.split_text(text) == split_text_by_words(text, 296, 16)
