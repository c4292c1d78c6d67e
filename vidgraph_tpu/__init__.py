"""vidgraph_tpu — a TPU-native real-time brain-inspired video-memory framework.

Re-implements the capabilities of the reference VidGraph pipeline
(RaphaelHaddad/Real-Time-Brain-Inspired-Video-Memory) as an idiomatic
JAX / XLA / Pallas / pjit framework:

* video chunking + on-device frame preprocessing (fused Pallas kernel)
* vision tower (ViT) + captioner running batched on TPU
* HBM-resident embedding memory with a fused cosine top-k kernel
* knowledge-graph construction with two-stage LLM triplet extraction
* hybrid online/offline retrieval (vector + fulltext + traversal +
  compression + rerank)
* network-science graph metrics as XLA linear algebra
* benchmark evaluation, export/import, CLI, sweep tooling

External contracts (CLI surface, vlm_output.json schema, export format
v1.0, retrieval/benchmark JSON schemas, YAML config tree) are preserved
from the reference — see SURVEY.md for the file-level parity map.
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: first-compile costs (which dominate
    short CLI invocations, especially via remote-compile tunnels) are paid
    once per kernel shape across all processes."""
    import os

    try:
        import jax

        cache_dir = os.environ.get(
            "VIDGRAPH_JAX_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "vidgraph_jax_cache"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # cache is an optimisation, never a hard dependency
        pass


def _maybe_force_cpu() -> None:
    """``VIDGRAPH_FORCE_CPU=1`` pins jax to the host CPU for ANY entry
    point (CLI, scripts, ad-hoc shells).  Needed because the environment
    presets ``JAX_PLATFORMS=axon`` at the PJRT-plugin level, which
    overrides the env var — only a config update after import wins.  Use
    while the exclusive TPU is occupied (e.g. by a training run)."""
    import os

    if not os.environ.get("VIDGRAPH_FORCE_CPU"):
        return
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


_enable_compilation_cache()
_maybe_force_cpu()
