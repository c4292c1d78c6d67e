"""Golden-fixture regression: the deterministic offline pipeline must keep
producing exactly the committed artifacts (tests/golden/) — guards the
extraction heuristics, chunking, dedupe, graph semantics and fulltext
scoring across refactors.  If a change is INTENTIONAL, regenerate the
fixture (the recipe is in this file's docstring history / git log).
"""
import asyncio
import json
import os
from pathlib import Path

import pytest

GOLDEN = Path(__file__).parent / "golden" / "pipeline_golden.json"


@pytest.fixture(scope="module")
def rebuilt(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden")
    old = os.getcwd()
    os.chdir(d)
    try:
        from vidgraph_tpu.core.config import PipelineConfig
        from vidgraph_tpu.io.video import write_synthetic_video
        from vidgraph_tpu.pipeline.kg_builder import KGBuilder
        from vidgraph_tpu.pipeline.vlm_extractor import VLMExtractor

        cfg = PipelineConfig()
        cfg.backend.vlm = "local"
        cfg.backend.llm = "local"
        cfg.video.chunk_size_seconds = 2.0
        cfg.video.frames_per_chunk = 3
        cfg.kg.batch_size = 2
        cfg.graph_store.persist_dir = "gs"
        video = write_synthetic_video(
            "v.mp4", ["red", "blue", "green", "yellow"],
            seconds_per_scene=2.0, fps=5, motion=False)
        asyncio.run(VLMExtractor(cfg).process_video(video, "vlm.json"))
        builder = KGBuilder(cfg, run_uuid="golden")
        asyncio.run(builder.build_knowledge_graph("vlm.json"))
        from vidgraph_tpu.graph import open_graph_store
        store = open_graph_store(cfg, "golden")
        vlm = json.loads(Path("vlm.json").read_text())
        yield store, vlm
    finally:
        os.chdir(old)


def test_pipeline_matches_golden(rebuilt):
    store, vlm = rebuilt
    golden = json.loads(GOLDEN.read_text())
    assert [it["content"] for it in vlm["results"]] == \
        golden["vlm_contents"]
    assert sorted(store.entities) == golden["entities"]
    assert sorted("|".join(k) for k in store.rels) == golden["rels"]
    assert sorted(store.chunks) == golden["chunk_ids"]
    assert store.get_chunk_counts() == golden["chunk_counts"]
    got_ft = [e["name"] for e in
              store.fulltext_search_entities("red shape object", 3)]
    assert got_ft == golden["fulltext_top"]
