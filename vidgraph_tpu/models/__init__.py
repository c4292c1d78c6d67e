from .captioner import CaptionerConfig, forward, generate, init_params
from .text_embedder import (HashedNGramEmbedder, TransformerTextEmbedder,
                            make_embedder)
from .tokenizer import BOS_ID, EOS_ID, PAD_ID, VOCAB_SIZE, decode, encode
from .vit import ViTConfig, VisionTower, init_vision_tower

__all__ = [
    "CaptionerConfig", "forward", "generate", "init_params",
    "HashedNGramEmbedder", "TransformerTextEmbedder", "make_embedder",
    "BOS_ID", "EOS_ID", "PAD_ID", "VOCAB_SIZE", "decode", "encode",
    "ViTConfig", "VisionTower", "init_vision_tower",
]
