"""End-to-end pipeline tests on a synthetic video with offline backends:
local VLM captions, local deterministic LLM, device hash embedder."""
import asyncio
import json
import os
from pathlib import Path

import pytest

from vidgraph_tpu.core.config import PipelineConfig


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    old = os.getcwd()
    os.chdir(d)
    yield d
    os.chdir(old)


@pytest.fixture(scope="module")
def config(workdir):
    cfg = PipelineConfig()
    cfg.backend.vlm = "local"
    cfg.backend.llm = "local"
    cfg.backend.embedder = "tpu"
    cfg.backend.reranker = "tpu"
    cfg.video.chunk_size_seconds = 2.0
    cfg.video.frames_per_chunk = 3
    cfg.kg.batch_size = 2
    cfg.graph_store.persist_dir = str(workdir / "graph_store")
    cfg.retrieval.entity_first = False
    cfg.retrieval.post_compression = True
    cfg.retrieval.compression_threshold = 0.05
    return cfg


@pytest.fixture(scope="module")
def video(workdir):
    from vidgraph_tpu.io.video import write_synthetic_video
    return write_synthetic_video(
        str(workdir / "synthetic.mp4"),
        scenes=["red", "blue", "green", "yellow"],
        seconds_per_scene=2.0, fps=5)


@pytest.fixture(scope="module")
def vlm_output(workdir, config, video):
    from vidgraph_tpu.pipeline.vlm_extractor import VLMExtractor
    out = str(workdir / "vlm_output.json")
    result = asyncio.run(VLMExtractor(config).process_video(video, out))
    return out, result


def test_vlm_output_schema(vlm_output):
    path, result = vlm_output
    data = json.loads(Path(path).read_text())
    assert set(data) == {"metadata", "results"}
    md = data["metadata"]
    assert set(md) >= {"run_id", "video_path", "total_chunks", "config"}
    assert md["total_chunks"] == len(data["results"]) == 4
    for i, item in enumerate(data["results"]):
        assert set(item) == {"time", "content", "chunk_idx",
                             "processing_time"}
        assert item["chunk_idx"] == i
    assert data["results"][0]["time"] == "00:00-00:01"
    assert data["results"][1]["time"] == "00:02-00:03"
    # local VLM describes scene colors
    assert "red" in data["results"][0]["content"]
    assert "blue" in data["results"][1]["content"]


@pytest.fixture(scope="module")
def built_graph(workdir, config, vlm_output):
    from vidgraph_tpu.pipeline.kg_builder import KGBuilder
    path, _ = vlm_output
    builder = KGBuilder(config)
    uuid = asyncio.run(builder.build_knowledge_graph(path))
    return uuid, builder


def test_kg_builds_nonempty_graph(built_graph, config):
    from vidgraph_tpu.graph import open_graph_store
    uuid, _ = built_graph
    store = open_graph_store(config, uuid)
    assert store.get_node_count() > 0
    assert len(store.chunks) > 0
    cc = store.get_chunk_counts()
    assert cc["with_embedding"] == cc["total_chunks"] > 0
    # triplets extracted from the deterministic captions
    assert store.get_relationship_count() > 0
    # metrics files written
    assert Path(f"metrics/kg_{uuid}.json").exists()
    assert Path(f"metrics/{uuid}_batch_metrics_kg.json").exists()
    batch_metrics = json.loads(
        Path(f"metrics/{uuid}_batch_metrics_kg.json").read_text())
    assert len(batch_metrics) == 2  # 4 chunks / batch_size 2
    nm = batch_metrics[0]["network_metrics"]
    assert "node_count" in nm and "pagerank_top10_percent" in nm
    # trace files written
    assert list(Path("logs").glob(f"injection_{uuid}_batch_*.log"))


def test_offline_retrieval(built_graph, config, workdir):
    from vidgraph_tpu.pipeline.retriever import OfflineRetriever
    uuid, _ = built_graph
    r = OfflineRetriever(config, uuid)
    rec = asyncio.run(r.retrieve("What color is the object in the scene?",
                                 groundtruth="red"))
    assert rec["graph_uuid"] == uuid
    assert rec["retrieval"].startswith("Found results for ")
    assert "Chunks (" in rec["retrieval"] or "Related Entities" \
        in rec["retrieval"]
    r.close()


def test_batch_retrieve_and_benchmark(built_graph, config, workdir):
    from vidgraph_tpu.pipeline.benchmark import BenchmarkEvaluator
    from vidgraph_tpu.pipeline.retriever import OfflineRetriever
    uuid, _ = built_graph
    queries = [
        {"query": "What color is the first object shown?",
         "groundtruth": "red"},
        {"query": "Is there a blue shape in the video?",
         "groundtruth": "blue"},
        {"query": "no groundtruth query"},
    ]
    qpath = workdir / "queries.json"
    qpath.write_text(json.dumps(queries))
    out = workdir / "batch_retrieval_results.json"
    r = OfflineRetriever(config, uuid)
    results = asyncio.run(r.batch_retrieve_from_file(str(qpath), str(out)))
    r.close()
    assert len(results) == 3
    for rec in results:
        assert set(rec) == {"query", "groundtruth", "retrieval",
                            "graph_uuid", "retrieval_time", "verbose"}

    bench_out = workdir / "benchmark.json"
    stats = asyncio.run(BenchmarkEvaluator(config).
                        evaluate_retrieval_results(str(out),
                                                   str(bench_out)))
    s = stats["statistics"]
    assert s["total_queries"] == 3
    assert s["skipped_answers"] == 1
    assert s["correct_answers"] + s["incorrect_answers"] == 2
    assert 0.0 <= s["accuracy"] <= 1.0
    # the deterministic pipeline should answer the color questions
    assert s["correct_answers"] >= 1


def test_export_import_via_cli(built_graph, config, workdir):
    from vidgraph_tpu.cli.main import main
    uuid, _ = built_graph
    cfg_path = workdir / "config.yaml"
    import yaml
    cfg_path.write_text(yaml.safe_dump(config.to_dict()))
    export_path = workdir / "export.json"
    assert main(["export", "--config", str(cfg_path),
                 "--graph-uuid", uuid, "--output", str(export_path)]) == 0
    data = json.loads(export_path.read_text())
    assert data["export_format_version"] == "1.0"
    assert main(["import", "--config", str(cfg_path),
                 "--input", str(export_path)]) == 0


def test_online_scheduled_retrieval(workdir, config, vlm_output):
    from vidgraph_tpu.pipeline.kg_builder import KGBuilder
    path, _ = vlm_output
    schedule = [
        {"time": "00:01", "query": "What color is the object?",
         "groundtruth": "red"},
        {"time": "99:99", "query": "never triggers", "groundtruth": "x"},
    ]
    spath = workdir / "schedule.json"
    spath.write_text(json.dumps(schedule))
    builder = KGBuilder(config)
    uuid = asyncio.run(builder.build_knowledge_graph(
        path, retrieval_schedule_path=str(spath)))
    results_file = Path("retrieval_results.json")
    assert results_file.exists()
    recs = json.loads(results_file.read_text())
    assert len(recs) == 1
    assert recs[0]["query"] == "What color is the object?"
    assert recs[0]["retrieval"].startswith("Found results for ")


def test_ask_via_cli(built_graph, config, workdir, capsys):
    from vidgraph_tpu.cli.main import main
    uuid, _ = built_graph
    import yaml
    cfg_path = workdir / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(config.to_dict()))
    assert main(["ask", "--config", str(cfg_path), "--graph-uuid", uuid,
                 "--query", "What color is the first object?"]) == 0
    out = capsys.readouterr().out
    assert "Answered in" in out
    # the answer line precedes the timing line and is non-empty prose
    answer = out.strip().splitlines()[0]
    assert len(answer) > 3
