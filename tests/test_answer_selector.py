"""Round-4 answer-selection model (VERDICT r3 missing #1 / next #2):
the benchmark answer role runs a trained cross-encoder that SELECTS
context sentences; assembly is extractive."""
import json

import jax.numpy as jnp
import numpy as np

from vidgraph_tpu.models.answer_selector import AnswerSelector
from vidgraph_tpu.models.checkpoint import save_params
from vidgraph_tpu.models.reranker import RerankerConfig, init_reranker_params

CTX = """Found results for 'what color is the beaker?':
Chunks (2):
  1. Time: 00:10-00:15
Content: The scientist pours liquid into a red beaker. (score: 0.83)
  2. The balance displays a reading of 42.5 g. (score: 0.76)
"""


def test_selector_scores_and_answers():
    sel = AnswerSelector(cfg=RerankerConfig.tiny())
    s = sel.score("what color is the beaker?",
                  ["The red beaker.", "A balance.", "The bench."])
    assert s.shape == (3,)
    ans = sel.answer("what color is the beaker?", CTX)
    assert isinstance(ans, str) and ans.endswith(".")
    # extractive: the answer is assembled from context sentences only
    plain = ans.rstrip(".")
    for sent in plain.split(". "):
        assert sent in CTX, sent
    assert sel.answer("anything", "No results found") == "I don't know."


def test_selector_blend_mode_keeps_lexical_backbone():
    """``mode="blend"`` (the serving default) routes model scores through
    the teacher's semantic channel: with ANY selector weights (here:
    random), exact lexical matches still dominate — the color-bearing
    sentence wins over the numeric one for a color question."""
    sel = AnswerSelector(cfg=RerankerConfig.tiny(), mode="blend")
    ans = sel.answer("what color is the beaker?", CTX)
    assert "red beaker" in ans
    # pure mode with random weights has no such guarantee; it must still
    # stay extractive
    pure = AnswerSelector(cfg=RerankerConfig.tiny(), mode="pure")
    for sent in pure.answer("what color is the beaker?", CTX).rstrip(".")\
            .split(". "):
        assert sent in CTX, sent


def test_selector_checkpoint_sidecar_restores_config(tmp_path):
    cfg = RerankerConfig.tiny()
    params = init_reranker_params(cfg, seed=3)
    path = tmp_path / "sel.npz"
    save_params(params, str(path))
    path.with_suffix(".json").write_text(json.dumps({"selector_cfg": {
        "width": cfg.width, "layers": cfg.layers, "heads": cfg.heads,
        "max_len": cfg.max_len, "query_budget": cfg.query_budget}}))
    sel = AnswerSelector(checkpoint_path=str(path))   # no cfg passed
    assert sel.cfg.max_len == cfg.max_len
    assert np.allclose(np.asarray(sel.params["score_w"]),
                       np.asarray(params["score_w"]))


def test_chat_checkpoint_sidecar_pins_decode_budget(tmp_path):
    """The trained response-length distribution travels with the
    checkpoint: a ``max_new`` field in the sidecar overrides the client's
    decode budget (train == serve on the decode axis, round 4)."""
    from vidgraph_tpu.models.captioner import CaptionerConfig, init_params
    from vidgraph_tpu.services.llm_client import TPUChatClient

    lm_cfg = CaptionerConfig(width=32, layers=2, heads=2, vision_dim=32,
                             num_vision_tokens=2, max_len=640,
                             dtype=jnp.float32)
    path = tmp_path / "lm.npz"
    save_params(init_params(lm_cfg, seed=0), str(path))
    path.with_suffix(".json").write_text(
        json.dumps({"seq_len": 512, "max_new": 96}))
    client = TPUChatClient(cfg=lm_cfg, max_new=768,
                           checkpoint_path=str(path))
    assert client.MAX_NEW == 96
    # prompt budget reflects both the trained seq cap and the decode pin
    assert client.max_prompt_bytes == 512 - lm_cfg.num_vision_tokens - 96 - 2


def test_tpu_chat_client_routes_answer_prompts_to_selector(tmp_path):
    from vidgraph_tpu.models.captioner import CaptionerConfig
    from vidgraph_tpu.pipeline.prompts import build_benchmark_answer_prompt
    from vidgraph_tpu.services.llm_client import TPUChatClient

    cfg = RerankerConfig.tiny()
    path = tmp_path / "sel.npz"
    save_params(init_reranker_params(cfg, seed=0), str(path))
    path.with_suffix(".json").write_text(json.dumps({"selector_cfg": {
        "width": cfg.width, "layers": cfg.layers, "heads": cfg.heads,
        "max_len": cfg.max_len, "query_budget": cfg.query_budget}}))
    lm_cfg = CaptionerConfig(width=32, layers=2, heads=2, vision_dim=32,
                             num_vision_tokens=2, max_len=640,
                             dtype=jnp.float32)
    client = TPUChatClient(cfg=lm_cfg, max_new=16,
                           answer_selector_path=str(path))
    prompt = build_benchmark_answer_prompt("what color is the beaker?", CTX)
    out = client.complete_sync(prompt)
    # routed through the selector: extractive sentences, never byte noise
    assert out.endswith(".")
    for sent in out.rstrip(".").split(". "):
        assert sent in CTX, sent
    # non-answer prompts still go through the LM decode path
    out2 = client.complete_sync("Extract triplets: a person holds a flask.")
    assert isinstance(out2, str)


def test_local_chat_client_routes_answer_prompts_to_selector(tmp_path):
    """Round 4: the deterministic pipeline can carry the trained semantic
    channel too — LocalChatClient(answer_selector_path=...) routes ONLY
    the benchmark answer role through the selector; every other contract
    (extraction/judge/refinement) stays rule-based."""
    from vidgraph_tpu.pipeline.prompts import build_benchmark_answer_prompt
    from vidgraph_tpu.services.llm_client import (LocalChatClient,
                                                  make_chat_client)

    cfg = RerankerConfig.tiny()
    path = tmp_path / "sel.npz"
    save_params(init_reranker_params(cfg, seed=0), str(path))
    path.with_suffix(".json").write_text(json.dumps({"selector_cfg": {
        "width": cfg.width, "layers": cfg.layers, "heads": cfg.heads,
        "max_len": cfg.max_len, "query_budget": cfg.query_budget}}))
    client = make_chat_client("local", answer_selector_path=str(path))
    assert isinstance(client, LocalChatClient)
    prompt = build_benchmark_answer_prompt("what color is the beaker?", CTX)
    out = client.complete_sync(prompt)
    assert out.endswith(".")
    for sent in out.rstrip(".").split(". "):
        assert sent in CTX, sent
    # a judge prompt is NOT routed through the selector
    from vidgraph_tpu.pipeline.prompts import build_benchmark_evaluation_prompt
    judged = client.complete_sync(build_benchmark_evaluation_prompt(
        "q", "red beaker", "The beaker is red.", CTX))
    assert "is_correct" in judged
    # default construction (no selector) keeps the deterministic answerer
    base = LocalChatClient().complete_sync(prompt)
    assert base.endswith(".")


def test_missing_selector_checkpoint_degrades_softly(tmp_path, caplog):
    """A configured-but-absent selector checkpoint (checkpoints/ is
    gitignored and wiped by VM resets) must not crash client
    construction: it warns and falls back to the untrained answer path
    (services/llm_client.py::_load_selector, §5.3 degradation ladder)."""
    from vidgraph_tpu.services.llm_client import make_chat_client

    missing = str(tmp_path / "nope" / "answer_selector.npz")
    client = make_chat_client("local", answer_selector_path=missing)
    assert client._selector is None
    # the deterministic answer path still works
    prompt = ("Answer the question using the retrieved context.\n"
              f"CONTEXT: {CTX}\nQUESTION: what color is the beaker?\n"
              "CONCISE ANSWER:")
    assert isinstance(client.complete_sync(prompt), str)
