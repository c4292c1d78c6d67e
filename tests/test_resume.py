"""KG build checkpoint/resume + failure-injection tests."""
import asyncio
import json
import os

import pytest

from vidgraph_tpu.core.config import PipelineConfig
from vidgraph_tpu.pipeline.kg_builder import KGBuilder


@pytest.fixture
def env(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = PipelineConfig()
    cfg.backend.vlm = "local"
    cfg.backend.llm = "local"
    cfg.kg.batch_size = 1
    cfg.graph_store.persist_dir = str(tmp_path / "gs")
    results = [{"time": f"00:0{i}-00:0{i}",
                "content": f"the person holds a beaker number {i}",
                "chunk_idx": i, "processing_time": 0.1} for i in range(4)]
    vlm = tmp_path / "vlm.json"
    vlm.write_text(json.dumps({"metadata": {"run_id": "x",
                                            "video_path": "v",
                                            "total_chunks": 4,
                                            "config": {}},
                               "results": results}))
    return cfg, str(vlm)


def test_resume_continues_where_interrupted(env):
    cfg, vlm = env
    # "crash" after 2 of 4 batches
    b1 = KGBuilder(cfg)
    uuid = asyncio.run(b1.build_knowledge_graph(vlm, max_batches=2))
    from vidgraph_tpu.graph import open_graph_store
    s = open_graph_store(cfg, uuid)
    assert len(s.chunks) >= 2
    chunks_after_crash = set(s.chunks)
    s.close()

    # resume with the same uuid completes the remaining batches
    b2 = KGBuilder(cfg, run_uuid=uuid, load_existing=True)
    assert b2._completed_batches() == 2
    uuid2 = asyncio.run(b2.build_knowledge_graph(vlm, resume=True))
    assert uuid2 == uuid
    s = open_graph_store(cfg, uuid)
    batches = {int(c.split("_")[-2]) for c in s.chunks}
    assert batches == {0, 1, 2, 3}
    # earlier batches were not reprocessed (no duplicates; ids unique)
    assert chunks_after_crash <= set(s.chunks)
    s.close()


def test_flaky_llm_chunks_are_skipped_not_fatal(env):
    """Per-chunk timeout/retry ladder: a chat client that always times out
    must not kill the build — chunks are skipped (reference behaviour)."""
    cfg, vlm = env
    cfg.chunking.chunk_timeout_seconds = 0.05
    cfg.chunking.chunk_timeout_retries = 2

    class HangingChat:
        async def complete(self, prompt, **kw):
            if "TRIPLET LINES:" in prompt:
                await asyncio.sleep(10)   # always exceeds the timeout
            return "{}"

    builder = KGBuilder(cfg, chat_client=HangingChat())
    uuid = asyncio.run(builder.build_knowledge_graph(vlm, max_batches=2))
    from vidgraph_tpu.graph import open_graph_store
    s = open_graph_store(cfg, uuid)
    # chunks still created (vector retrieval keeps working), no triplets
    assert len(s.chunks) == 2
    assert s.get_relationship_count() == 0
    s.close()
