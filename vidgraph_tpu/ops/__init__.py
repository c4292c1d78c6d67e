from .preprocess import patchify, preprocess_frames
from .topk_cosine import cosine_scores, cosine_topk, l2_normalize

__all__ = ["patchify", "preprocess_frames", "cosine_scores", "cosine_topk",
           "l2_normalize"]
