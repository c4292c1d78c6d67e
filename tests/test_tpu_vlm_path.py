"""End-to-end VLM extraction through the in-process TPU captioner path
(tiny models on CPU: exercises preprocessing -> ViT -> batched decode)."""
import asyncio
import json
from pathlib import Path

import pytest

from vidgraph_tpu.core.config import PipelineConfig
from vidgraph_tpu.models.captioner import CaptionerConfig
from vidgraph_tpu.models.vit import ViTConfig
from vidgraph_tpu.pipeline.vlm_extractor import VLMExtractor
from vidgraph_tpu.services.vlm_client import TPUVLMClient


def test_extractor_with_tpu_captioner(tmp_path, monkeypatch):
    from vidgraph_tpu.io.video import write_synthetic_video

    monkeypatch.chdir(tmp_path)
    video = write_synthetic_video(str(tmp_path / "v.mp4"), ["red", "blue"],
                                  seconds_per_scene=1.0, fps=4,
                                  size=(64, 64))
    cfg = PipelineConfig()
    cfg.video.chunk_size_seconds = 1.0
    cfg.video.frames_per_chunk = 2
    client = TPUVLMClient(vit_cfg=ViTConfig.tiny(),
                          cap_cfg=CaptionerConfig.tiny(), max_new=6)
    out = tmp_path / "vlm_output.json"
    result = asyncio.run(VLMExtractor(cfg, vlm_client=client)
                         .process_video(video, str(out)))
    data = json.loads(out.read_text())
    assert data["metadata"]["total_chunks"] == len(data["results"]) == 2
    for item in data["results"]:
        assert isinstance(item["content"], str)
        assert item["processing_time"] > 0
