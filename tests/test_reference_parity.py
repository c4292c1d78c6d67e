"""Parity checks against the reference's committed artifacts (read-only at
/root/reference; skipped when the mount is absent)."""
import asyncio
import json
from pathlib import Path

import pytest

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference mount not available")


def test_vlm_output_schema_matches_reference_artifact():
    """Our writer's schema must equal the reference artifact's."""
    ref = json.loads((REF / "data/outputs/vlm_output.json").read_text())
    assert set(ref) == {"metadata", "results"}
    ref_item_keys = set(ref["results"][0])
    # the schema our VLMExtractor emits (see test_pipeline_e2e)
    ours = {"time", "content", "chunk_idx", "processing_time"}
    assert ours == ref_item_keys
    ref_md = {"run_id", "video_path", "total_chunks", "config"}
    assert ref_md <= set(ref["metadata"])


def test_groundtruth_queries_through_retriever(tmp_path):
    """Import the committed reference graph and run a slice of the
    30-question groundtruth set through hybrid retrieval (entity-first:
    the reference export carries no chunk embeddings)."""
    from vidgraph_tpu.core.config import PipelineConfig
    from vidgraph_tpu.graph import EmbeddedGraphStore, GraphImporter
    from vidgraph_tpu.pipeline.retriever import OfflineRetriever

    export = next((REF / "data/exports").glob("*.json"))
    GraphImporter(lambda u: EmbeddedGraphStore(
        u, persist_dir=str(tmp_path))).import_graph(str(export),
                                                    new_uuid="refpar")
    questions = json.loads(
        (REF / "data/groundtruth/retrieval_offline.json").read_text())
    assert len(questions) == 30

    cfg = PipelineConfig()
    cfg.backend.llm = "local"
    cfg.retrieval.entity_first = True
    cfg.retrieval.use_reranker = True
    cfg.graph_store.persist_dir = str(tmp_path)
    r = OfflineRetriever(cfg, "refpar")
    answered = 0
    for item in questions[:5]:
        rec = asyncio.run(r.retrieve(item["query"], item["groundtruth"]))
        assert rec["retrieval"]
        if rec["retrieval"].startswith("Found results for"):
            answered += 1
    r.close()
    # the lab-video graph must yield hits for lab-centric questions
    assert answered >= 4


def test_export_format_fields_match_reference():
    ref = json.loads(next((REF / "data/exports").glob("*.json"))
                     .read_text())
    from vidgraph_tpu.graph.embedded import EmbeddedGraphStore
    s = EmbeddedGraphStore("fmt", persist_dir=None, persist=False)
    s.merge_entity("A", "00:00-00:04", 0, ["fmt_0_0"])
    ours = s.export_data()
    assert set(ours) == set(ref)
    assert ours["export_format_version"] == ref["export_format_version"]
    ref_node_keys = set(ref["nodes"][0])
    assert set(ours["nodes"][0]) == ref_node_keys
    ref_rel_keys = set(ref["relationships"][0])
    s.merge_entity("B", "00:00-00:04", 0, [])
    s.merge_relationship("A", "r", "B", 0, [])
    assert set(s.export_data()["relationships"][0]) == ref_rel_keys


def test_retrieval_result_record_schema():
    ref = json.loads(next((REF / "data/retrievals").glob("mvp_*.json"))
                     .read_text())
    ref_keys = set(ref[0])
    # our OfflineRetriever record keys are a superset contract
    ours = {"query", "groundtruth", "retrieval", "graph_uuid",
            "retrieval_time", "verbose"}
    assert ref_keys <= ours | {"time"}


def test_benchmark_statistics_schema():
    ref = json.loads(next((REF / "data/final_benchmarks").glob("*.json"))
                     .read_text())
    assert {"total_queries", "correct_answers", "incorrect_answers",
            "skipped_answers", "accuracy"} <= set(ref["statistics"])
