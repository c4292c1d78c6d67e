from .ingest import LiveKGIngestor, video_frame_source
from .realtime import FrameRing, RealtimeEngine, StreamSpec, simulate

__all__ = ["FrameRing", "RealtimeEngine", "StreamSpec", "simulate",
           "LiveKGIngestor", "video_frame_source"]
