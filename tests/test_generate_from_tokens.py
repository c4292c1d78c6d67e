"""Prompt-token-conditioned decoding (VERDICT r2 weak #5 / next #3):
``generate_from_tokens`` must agree exactly with teacher-forced
``forward`` logits and be invariant to right-padding."""
import jax.numpy as jnp
import numpy as np

from vidgraph_tpu.models import tokenizer
from vidgraph_tpu.models.captioner import (CaptionerConfig, forward,
                                           generate_from_tokens, init_params)

CFG = CaptionerConfig.tiny()      # nv=2, max_len=64, f32


def _pad(ids, t_pad):
    a = np.full((1, t_pad), tokenizer.PAD_ID, np.int32)
    a[0, :len(ids)] = ids
    return jnp.asarray(a)


def test_matches_teacher_forcing():
    params = init_params(CFG, seed=0)
    ids = tokenizer.encode("hello wor", add_bos=True, add_eos=False)
    out = np.asarray(generate_from_tokens(
        params, CFG, _pad(ids, 16), jnp.int32(len(ids)), max_new=4))[0]
    vis = jnp.zeros((1, CFG.num_vision_tokens, CFG.vision_dim), jnp.float32)
    cur = list(ids)
    for i in range(4):
        logits = np.asarray(forward(params, CFG, vis,
                                    jnp.asarray([cur], jnp.int32)))
        nxt = int(logits[0, -1].argmax())
        assert out[i] == nxt, f"step {i}: {out[i]} != {nxt}"
        if nxt == tokenizer.EOS_ID:
            assert all(int(t) == tokenizer.EOS_ID for t in out[i:])
            break
        cur.append(nxt)


def test_pad_amount_does_not_change_output():
    params = init_params(CFG, seed=1)
    ids = tokenizer.encode("abc", add_bos=True, add_eos=False)
    o16 = generate_from_tokens(params, CFG, _pad(ids, 16),
                               jnp.int32(len(ids)), max_new=6)
    o32 = generate_from_tokens(params, CFG, _pad(ids, 32),
                               jnp.int32(len(ids)), max_new=6)
    assert np.array_equal(np.asarray(o16), np.asarray(o32))


def test_prompt_conditioning_changes_output():
    """Different prompts must produce different continuations (the pooled
    round-2 conditioning collapsed most prompts to near-identical vectors)."""
    params = init_params(CFG, seed=2)
    a = tokenizer.encode("red beaker", add_bos=True, add_eos=False)
    b = tokenizer.encode("blue flame!", add_bos=True, add_eos=False)
    oa = np.asarray(generate_from_tokens(params, CFG, _pad(a, 16),
                                         jnp.int32(len(a)), max_new=8))
    ob = np.asarray(generate_from_tokens(params, CFG, _pad(b, 16),
                                         jnp.int32(len(b)), max_new=8))
    assert not np.array_equal(oa, ob)


def test_context_overflow_raises():
    params = init_params(CFG, seed=0)
    try:
        generate_from_tokens(params, CFG, _pad([1, 2, 3], 64),
                             jnp.int32(3), max_new=32)
    except ValueError as e:
        assert "max_len" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_ragged_batch_matches_single_row_decode():
    """Round-4 (VERDICT r3 missing #2): a ragged batch — per-row
    prompt_len vector — must produce, row for row, exactly the tokens
    each prompt produces decoded alone at B=1."""
    params = init_params(CFG, seed=3)
    prompts = ["red beaker", "a", "blue flame on the bench", "acid"]
    ids_list = [tokenizer.encode(p, add_bos=True, add_eos=False)
                for p in prompts]
    t_pad = 32
    toks = np.full((len(prompts), t_pad), tokenizer.PAD_ID, np.int32)
    lens = np.zeros((len(prompts),), np.int32)
    for r, ids in enumerate(ids_list):
        toks[r, :len(ids)] = ids
        lens[r] = len(ids)
    batched = np.asarray(generate_from_tokens(
        params, CFG, jnp.asarray(toks), jnp.asarray(lens), max_new=8))
    for r, ids in enumerate(ids_list):
        solo = np.asarray(generate_from_tokens(
            params, CFG, _pad(ids, t_pad), jnp.int32(len(ids)),
            max_new=8))[0]
        assert np.array_equal(batched[r], solo), (
            f"row {r} ({prompts[r]!r}): {batched[r]} != {solo}")


def test_early_exit_budget_invariance():
    """The decode budget must be invisible to the result: a completion
    that ends at EOS within a small budget must be byte-identical under
    a much larger budget, with the extra columns a pure EOS tail (done
    rows are forced to EOS every later step).  This also pins the
    contract any future early-exit optimisation must preserve
    (docs/DESIGN.md round-4 lesson 8).

    ADVICE r4 low #3: random-init models never emit EOS inside the
    budget, which made the old ``if eos_at.size`` guard silently
    vacuous.  EOS is now GUARANTEED mid-budget by planting a
    position-keyed logit spike: a huge ``pos_emb`` component along the
    EOS head column from position ``p`` on dominates the residual
    stream (layernorm preserves direction), so the argmax flips to EOS
    a few steps into the decode — deterministically."""
    params = init_params(CFG, seed=5)
    ids = tokenizer.encode("green", add_bos=True, add_eos=False)
    # decode positions start at nv + prompt_len; spike 3 steps in
    spike_pos = CFG.num_vision_tokens + len(ids) + 3
    v = np.asarray(params["head_w"][:, tokenizer.EOS_ID], np.float32)
    pe = np.array(params["pos_emb"], np.float32)  # copy: jax buffers are RO
    pe[spike_pos:] = v * (1000.0 / max(np.linalg.norm(v), 1e-6))
    params["pos_emb"] = jnp.asarray(pe)
    small = np.asarray(generate_from_tokens(
        params, CFG, _pad(ids, 16), jnp.int32(len(ids)), max_new=8))[0]
    large = np.asarray(generate_from_tokens(
        params, CFG, _pad(ids, 16), jnp.int32(len(ids)), max_new=32))[0]
    eos_at = np.where(small == tokenizer.EOS_ID)[0]
    assert eos_at.size, "EOS spike failed to fire inside the budget"
    assert 0 < eos_at[0] < 8          # genuinely mid-budget
    assert np.array_equal(small, large[:8])
    assert np.all(large[eos_at[0]:] == tokenizer.EOS_ID)


def test_chat_client_batch_matches_sync():
    """complete_batch_sync must return, per prompt, what complete_sync
    returns for that prompt alone (filler rows to the power-of-two batch
    bucket are discarded)."""
    from vidgraph_tpu.services.llm_client import TPUChatClient

    cfg = CaptionerConfig(width=32, layers=2, heads=2, vision_dim=32,
                          num_vision_tokens=2, max_len=640,
                          dtype=jnp.float32)
    client = TPUChatClient(cfg=cfg, max_new=16)
    prompts = ["one red beaker", "bench", "the blue flame heats a flask"]
    batch = client.complete_batch_sync(prompts, max_tokens=16)
    assert len(batch) == len(prompts)
    for p, got in zip(prompts, batch):
        assert got == client.complete_sync(p, max_tokens=16)


def test_chat_client_coalesces_concurrent_completes():
    """Concurrent async complete() calls must ride ONE batched dispatch
    through the ContinuousBatcher (not N solo decodes)."""
    import asyncio

    from vidgraph_tpu.services.llm_client import TPUChatClient

    cfg = CaptionerConfig(width=32, layers=2, heads=2, vision_dim=32,
                          num_vision_tokens=2, max_len=640,
                          dtype=jnp.float32)
    client = TPUChatClient(cfg=cfg, max_new=16)
    prompts = [f"prompt number {i} mentions a beaker" for i in range(6)]

    async def run():
        return await asyncio.gather(*[
            client.complete(p, max_tokens=16) for p in prompts])

    outs = asyncio.run(run())
    assert len(outs) == 6
    stats = client._batcher.stats()
    assert stats["batches"] < 6, f"no coalescing happened: {stats}"
    assert stats["max_batch_size"] > 1
    # and results match solo decodes regardless of batch composition
    for p, got in zip(prompts, outs):
        assert got == client.complete_sync(p, max_tokens=16)


def test_decode_budget_clamps_to_pow2_buckets():
    from vidgraph_tpu.services.llm_client import TPUChatClient

    cfg = CaptionerConfig.tiny()
    client = TPUChatClient(cfg=cfg, max_new=768)
    assert client._decode_budget(128) == 128
    assert client._decode_budget(100) == 128
    assert client._decode_budget(2048) == 768   # capped at MAX_NEW
    assert client._decode_budget(1) == 64       # floor bucket


def test_fit_prompt_bytes_multibyte_stays_under_budget():
    """ADVICE r3 (medium): U+FFFD re-encoding at the cut points must not
    push the fitted prompt over budget."""
    from vidgraph_tpu.services.llm_client import fit_prompt_bytes

    budget = 256
    for text in ("é" * 500, "°C " * 300, "héad" + "χψω" * 200 + "tail",
                 "\U0001f600" * 150):
        fitted = fit_prompt_bytes(text, budget)
        assert len(fitted.encode("utf-8")) < budget, text[:20]


def test_tpu_chat_client_serves_prompt_tokens():
    from vidgraph_tpu.services.llm_client import TPUChatClient

    cfg = CaptionerConfig(width=32, layers=2, heads=2, vision_dim=32,
                          num_vision_tokens=2, max_len=640,
                          dtype=jnp.float32)
    client = TPUChatClient(cfg=cfg, max_new=16)
    out = client.complete_sync("Extract triplets from: a person holds "
                               "a beaker.")
    assert isinstance(out, str)          # random weights: just mechanics
    # over-long prompts keep head + tail STRICTLY within the byte budget
    # (the +1 BOS token must still fit the decode bucket cap)
    from vidgraph_tpu.services.llm_client import fit_prompt_bytes
    for extra in (1, 5, 5000):
        long = "HEAD " + ("x" * (client.max_prompt_bytes + extra)) + " TAIL"
        fitted = fit_prompt_bytes(long, client.max_prompt_bytes)
        assert len(fitted.encode()) < client.max_prompt_bytes
        assert fitted.startswith("HEAD") and fitted.endswith("TAIL")
    out = client.complete_sync(long)      # boundary-length prompt serves
    assert isinstance(out, str)
