from .realtime import FrameRing, RealtimeEngine, StreamSpec, simulate

__all__ = ["FrameRing", "RealtimeEngine", "StreamSpec", "simulate"]
