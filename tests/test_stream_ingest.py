"""Live KG construction from a running stream."""
import asyncio

import numpy as np
import pytest

from vidgraph_tpu.core.config import PipelineConfig
from vidgraph_tpu.graph.embedded import EmbeddedGraphStore
from vidgraph_tpu.services.embed_client import make_embed_client
from vidgraph_tpu.services.llm_client import LocalChatClient
from vidgraph_tpu.services.vlm_client import LocalVLMClient
from vidgraph_tpu.streams import (LiveKGIngestor, RealtimeEngine,
                                  StreamSpec, simulate, video_frame_source)


def test_video_frame_source(tmp_path):
    from vidgraph_tpu.io.video import write_synthetic_video
    path = write_synthetic_video(str(tmp_path / "v.mp4"), ["red"],
                                 seconds_per_scene=1.0, fps=5)
    frames = list(video_frame_source(path))
    assert len(frames) == 5
    assert frames[0].shape[2] == 3


def test_live_kg_from_stream():
    cfg = PipelineConfig()
    cfg.backend.llm = "local"
    cfg.kg.batch_size = 2
    cfg.llm_injector.subgraph_extraction_injection = False
    embed = make_embed_client("tpu", dim=64)
    ingestor = LiveKGIngestor(
        cfg, LocalChatClient(), embed,
        store_factory=lambda sid: EmbeddedGraphStore(
            sid, persist_dir=None, persist=False, dim=64))
    spec = StreamSpec("cam0", fps=10.0, chunk_size_seconds=1.0,
                      frames_per_chunk=3, height=48, width=64)
    engine = RealtimeEngine([spec], embed_client=embed,
                            vlm_client=LocalVLMClient(),
                            kg_extractor=ingestor)

    frame = np.zeros((48, 64, 3), np.uint8)
    frame[8:40, 16:48] = (200, 30, 30)

    def src():
        while True:
            yield frame

    out = asyncio.run(_run(engine, ingestor, {"cam0": src()}))
    store = ingestor.stores["cam0"]
    # live graph grew: entities + chunks + typed rels from the captions
    assert store.get_node_count() > 0
    assert store.get_relationship_count() > 0
    assert store.get_chunk_counts()["with_embedding"] > 0
    # graph is queryable via fulltext
    ents = store.fulltext_search_entities("red shape object", top_k=5)
    assert ents
    ingestor.close()


async def _run(engine, ingestor, sources):
    out = await simulate(engine, sources, video_seconds=6.0)
    await ingestor.flush()
    return out


def test_live_hybrid_query_against_stream_graph():
    """Attach the live KG to the engine: queries upgrade to full hybrid
    retrieval (vector + fulltext + traversal) over the growing graph."""
    cfg = PipelineConfig()
    cfg.backend.llm = "local"
    cfg.kg.batch_size = 2
    cfg.llm_injector.subgraph_extraction_injection = False
    cfg.retrieval.entity_first = False
    cfg.retrieval.post_compression = False
    cfg.retrieval.use_reranker = False
    embed = make_embed_client("tpu", dim=64)
    ingestor = LiveKGIngestor(
        cfg, LocalChatClient(), embed,
        store_factory=lambda sid: EmbeddedGraphStore(
            sid, persist_dir=None, persist=False, dim=64))
    spec = StreamSpec("cam0", fps=10.0, chunk_size_seconds=1.0,
                      frames_per_chunk=3, height=48, width=64)
    engine = RealtimeEngine([spec], embed_client=embed,
                            vlm_client=LocalVLMClient(),
                            retrieval_config=cfg.retrieval,
                            kg_extractor=ingestor)

    frame = np.zeros((48, 64, 3), np.uint8)
    frame[8:40, 16:48] = (200, 30, 30)

    def src():
        while True:
            yield frame

    async def run():
        await simulate(engine, {"cam0": src()}, video_seconds=5.0)
        await ingestor.flush()
        engine.attach_graph_store("cam0", ingestor.stores["cam0"])
        return await engine.query("cam0", "is there a red shape object?")

    res = asyncio.run(run())
    assert res["retrieval"].startswith("Found results for")
    assert "Related Entities" in res["retrieval"] or "Chunks (" \
        in res["retrieval"]
    ingestor.close()
