"""Tests for utils, relation pruner, sweep runner, and plot tooling."""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def test_embedding_utils():
    from vidgraph_tpu.utils import EmbeddingUtils
    u = EmbeddingUtils(dim=64)
    v = u.create_embeddings(["blue glove", "blue gloves", "stock market"])
    assert v.shape == (3, 64)
    assert u.cosine_similarity(v[0], v[1]) > u.cosine_similarity(v[0], v[2])
    assert u.cosine_similarity([0, 0], [0, 0]) == 0.0


def test_frame_utils_roundtrip(tmp_path):
    from vidgraph_tpu.io.video import write_synthetic_video
    from vidgraph_tpu.utils import (extract_keyframes, frames_to_base64,
                                    resize_frame)
    video = write_synthetic_video(str(tmp_path / "v.mp4"), ["red"],
                                  seconds_per_scene=1.0, fps=5)
    frames = extract_keyframes(video, num_frames=3)
    assert len(frames) == 3
    big = np.zeros((1440, 2560, 3), np.uint8)
    small = resize_frame(big)
    assert max(small.shape[:2]) <= 720
    b64 = frames_to_base64(frames)
    assert len(b64) == 3 and all(isinstance(s, str) for s in b64)


def test_prune_keeps_representative(tmp_path):
    from vidgraph_tpu.pipeline.prune import Graph
    data = {
        "graph_uuid": "x", "export_format_version": "1.0", "nodes": [],
        "relationships": [
            {"type": "HOLDS", "from_node": "Person", "to_node": "Beaker",
             "properties": {}},
            {"type": "IS_HOLDING", "from_node": "Person",
             "to_node": "Beaker", "properties": {}},
            {"type": "THREW_AWAY", "from_node": "Person",
             "to_node": "Beaker", "properties": {}},
            {"type": "CONTAINS", "from_node": "Table", "to_node": "Flask",
             "properties": {}},
            {"type": "FROM_CHUNK", "from_node": "Person",
             "to_node": "c_0_0", "properties": {}},
        ],
    }
    g = Graph(data, threshold=0.6)
    pruned = g.prune_graph()
    rels = pruned["relationships"]
    # FROM_CHUNK and singleton pairs always survive
    assert any(r["type"] == "FROM_CHUNK" for r in rels)
    assert any(r["type"] == "CONTAINS" for r in rels)
    # the Person->Beaker group is either collapsed (if mutually similar)
    # or kept whole — never partially dropped below 1
    pb = [r for r in rels if r["from_node"] == "Person"
          and r["to_node"] == "Beaker"]
    assert 1 <= len(pb) <= 3


def test_prune_cli(tmp_path):
    from vidgraph_tpu.cli.main import main
    data = {"graph_uuid": "x", "export_format_version": "1.0",
            "nodes": [], "relationships": [
                {"type": "HOLDS", "from_node": "A", "to_node": "B",
                 "properties": {}},
                {"type": "IS_HOLDING", "from_node": "A", "to_node": "B",
                 "properties": {}}]}
    src = tmp_path / "export.json"
    src.write_text(json.dumps(data))
    out = tmp_path / "pruned.json"
    assert main(["prune", "--input", str(src), "--output", str(out),
                 "--threshold", "0.5"]) == 0
    assert out.exists()


def test_sweep_dry_run(tmp_path):
    summary_dir = tmp_path / "sweep"
    cmd = [sys.executable, str(REPO / "scripts" / "run_parameter_sweep.py"),
           "--vlm-output", "unused.json", "--queries", "unused.json",
           "--output-dir", str(summary_dir), "--epochs", "3", "--dry-run"]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    summary = json.loads((summary_dir / "sweep_summary.json").read_text())
    assert len(summary["epochs"]) == 3
    for e in summary["epochs"]:
        assert e["status"] == "dry_run"
        assert set(e["params"]) == {"chunk_size", "chunk_overlap",
                                    "max_triplets_per_chunk",
                                    "global_triplet_limit",
                                    "max_new_triplets"}
        cfg = (summary_dir / f"epoch_{e['epoch']:03d}_config.yaml")
        assert cfg.exists()
        import yaml
        loaded = yaml.safe_load(cfg.read_text())
        assert loaded["llm_injector"]["subgraph_extraction_injection"] is True


def test_plot_metrics(tmp_path):
    sys.path.insert(0, str(REPO / "scripts" / "plot"))
    from plot_metrics import make_plots
    metrics = [{"batch_idx": i, "total_time": 1.0 + i,
                "network_metrics": {"node_count": 10 * (i + 1),
                                    "density": 0.1}}
               for i in range(4)]
    mpath = tmp_path / "run_batch_metrics_kg.json"
    mpath.write_text(json.dumps(metrics))
    cfg = tmp_path / "plot.yaml"
    import yaml
    cfg.write_text(yaml.safe_dump({
        "runs": [{"path": str(mpath), "label": "r1"}],
        "metrics": {"node_count": True, "density": True}}))
    out = make_plots(str(cfg), str(tmp_path / "plot.png"))
    assert Path(out).exists()


def test_analyze_sweep_light(tmp_path):
    summary = {"epochs": [
        {"epoch": i, "accuracy": 0.2 + 0.05 * i,
         "avg_retrieval_time": 0.1,
         "params": {"chunk_size": 128 + 50 * i, "chunk_overlap": 16,
                    "max_triplets_per_chunk": 6,
                    "global_triplet_limit": 15, "max_new_triplets": 10}}
        for i in range(5)]}
    spath = tmp_path / "sweep_summary.json"
    spath.write_text(json.dumps(summary))
    cmd = [sys.executable, str(REPO / "scripts" /
                               "analyze_sweep_results.py"),
           "--summary", str(spath), "--output-dir", str(tmp_path / "out")]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    assert (tmp_path / "out" / "light_report.md").exists()


def test_analyze_sweep_full(tmp_path):
    summary = {"epochs": [
        {"epoch": i, "accuracy": 0.2 + 0.03 * (i % 7),
         "avg_retrieval_time": 0.1 + 0.01 * i,
         "elapsed_s": 30 + i,
         "params": {"chunk_size": 128 + 30 * i, "chunk_overlap": 8 + i,
                    "max_triplets_per_chunk": 3 + (i % 5),
                    "global_triplet_limit": 10 + i,
                    "max_new_triplets": 5 + (i % 8)}}
        for i in range(12)]}
    spath = tmp_path / "sweep_summary.json"
    spath.write_text(json.dumps(summary))
    # per-epoch batch-metrics files drive the network-science figures
    for i in range(12):
        bm = [{"batch_idx": b, "total_time": 0.4 + 0.01 * b,
               "network_metrics": {
                   "node_count": 20 + 30 * b + i,
                   "relationship_count": 25 + 40 * b + i,
                   "density": 0.06 - 0.002 * b,
                   "avg_degree": 2.5 + 0.1 * b,
                   "clustering_coefficient": 0.3 + 0.01 * (i % 4),
                   "avg_path_length": 2.4 + 0.05 * b,
                   "global_efficiency": 0.4,
                   "louvain_modularity": 0.4 + 0.01 * (i % 3),
                   "louvain_communities": 5 + b,
                   "graph_robustness": 0.9,
                   "degree_assortativity": -0.3,
                   "pagerank_top10_percent": 60.0,
                   "label_entropy": 1.2 + 0.05 * b,
                   "weakly_connected_components": 3}}
              for b in range(6)]
        (tmp_path / f"epoch_{i:03d}_batch_metrics.json").write_text(
            json.dumps(bm))
    cmd = [sys.executable, str(REPO / "scripts" /
                               "analyze_parameter_sweep.py"),
           "--summary", str(spath), "--output-dir", str(tmp_path / "an")]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=240)
    assert proc.returncode == 0, proc.stderr
    analysis = json.loads((tmp_path / "an" / "analysis.json").read_text())
    assert analysis["optimal_config"]["accuracy"] is not None
    # the full suite: >= 10 figures incl. the network-science set and the
    # Tukey HSD post-hoc table (reference :374,:908,:978,:1059,:1112)
    assert len(analysis["figures"]) >= 10, analysis["figures"]
    for name in ("small_world_analysis.png", "graph_size_scaling.png",
                 "network_health_dashboard.png", "conference_figure.png",
                 "accuracy_per_epoch.png"):
        assert (tmp_path / "an" / name).exists(), name
    assert analysis["tukey_hsd"], "tukey table missing"
    assert analysis["ols"] and analysis["ols"]["r_squared"] is not None
    report = (tmp_path / "an" / "sweep_analysis_report.md").read_text()
    assert "Tukey HSD post-hoc" in report
