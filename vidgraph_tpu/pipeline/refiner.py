"""Global refinement: one LLM pass consolidating the batch's triplets.

Two modes, parity with reference src/components/global_refiner.py:43-460:

* legacy ``refine_triplets`` — asks for ``{"triplets": [[h, r, t, [src]]]}``,
  restores missing source_chunks by exact match then SequenceMatcher >= 0.7
  fuzzy backtracking, and falls back to dedupe-only on any error;
* ``refine_triplets_instruction_based`` — with subgraph context, asks for 4
  operation lists (new_triplets / inter_chunk_relations /
  merge_instructions / prune_instructions), parses JSON out of raw text
  (direct parse, then first ``{...}`` block), converts source chunk ids to
  the short ``batch_chunk`` form in the prompt, and force-empties the
  context-dependent op lists when the context was empty (hallucination
  guard).

Refinement LLM runs at temperature 0.0.
"""
from __future__ import annotations

import json
import re
import time
from difflib import SequenceMatcher
from typing import Any, Dict, List, Optional

from ..core.config import ChunkingConfig
from ..core.logger import get_logger
from .pre_injector import get_short_chunk_id
from .prompts import build_injector_prompt, build_instruction_prompt

logger = get_logger("global_refiner")


def parse_json_object(text: str) -> Optional[Dict[str, Any]]:
    """Direct JSON parse, else first {...} block in the text."""
    try:
        return json.loads(text.strip())
    except (json.JSONDecodeError, AttributeError):
        pass
    m = re.search(r"\{[\s\S]*\}", text or "")
    if m:
        try:
            return json.loads(m.group(0))
        except json.JSONDecodeError:
            return None
    return None


def _triplet_key(tr: Dict[str, Any]) -> str:
    return (f"{str(tr.get('head', '')).lower()}|"
            f"{str(tr.get('relation', '')).lower()}|"
            f"{str(tr.get('tail', '')).lower()}")


class GlobalRefiner:
    def __init__(self, chunking_config: ChunkingConfig, chat_client) -> None:
        self.config = chunking_config
        self.chat = chat_client

    # --------------------------------------------------------------- legacy
    async def refine_triplets(self, triplets: List[Dict[str, Any]],
                              network_info: str = "",
                              global_limit: int = 25,
                              ) -> List[Dict[str, Any]]:
        if not triplets:
            return []
        capped = triplets[:global_limit]
        try:
            prompt = build_injector_prompt(
                json.dumps(capped), network_info or
                "No graph context available",
                self.config.max_new_triplets or global_limit)
            t0 = time.perf_counter()
            raw = await self.chat.complete(
                prompt, temperature=0.0,
                max_tokens=self.config.refinement_max_tokens)
            logger.debug("Refinement LLM call took %.2fs",
                         time.perf_counter() - t0)
            data = parse_json_object(raw)
            if data is None or "triplets" not in data:
                raise ValueError("no triplets JSON in refinement output")
            refined = []
            for item in data["triplets"]:
                if isinstance(item, (list, tuple)) and len(item) == 4:
                    refined.append({
                        "head": item[0], "relation": item[1],
                        "tail": item[2],
                        "source_chunks": (item[3] if isinstance(item[3], list)
                                          else [item[3]]),
                    })
            for tr in refined:
                if not tr.get("source_chunks"):
                    tr["source_chunks"] = self._backtrack_chunk_indices(
                        tr, capped)
                else:
                    tr["source_chunks"] = sorted(set(tr["source_chunks"]),
                                                 key=str)
            logger.info("Refinement: %d -> %d triplets", len(capped),
                        len(refined))
            return refined
        except Exception as e:
            logger.error("Global refinement failed: %s — falling back to "
                         "dedupe", e)
            return self._deduplicate(capped)

    def _backtrack_chunk_indices(self, refined: Dict[str, Any],
                                 originals: List[Dict[str, Any]]) -> List:
        rkey = _triplet_key(refined)
        for orig in originals:
            if _triplet_key(orig) == rkey:
                return orig.get("source_chunks", [])
        best, best_ratio = [], 0.0
        for orig in originals:
            ratio = SequenceMatcher(None, rkey, _triplet_key(orig)).ratio()
            if ratio > best_ratio:
                best_ratio = ratio
                best = orig.get("source_chunks", [])
        if best_ratio > 0.7:
            return best
        logger.warning("Could not backtrack triplet to sources: %s", refined)
        return []

    @staticmethod
    def _deduplicate(triplets: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
        seen: Dict[str, Dict[str, Any]] = {}
        out = []
        for tr in triplets:
            key = _triplet_key(tr)
            if "||" in key or key.startswith("|") or key.endswith("|"):
                continue
            sources = tr.get("source_chunks", [])
            if not isinstance(sources, list):
                sources = [sources] if sources else []
            if key not in seen:
                entry = {"head": tr.get("head", ""),
                         "relation": tr.get("relation", ""),
                         "tail": tr.get("tail", ""),
                         "source_chunks": sorted(set(sources), key=str)}
                seen[key] = entry
                out.append(entry)
            else:
                seen[key]["source_chunks"] = sorted(
                    set(seen[key]["source_chunks"]) | set(sources), key=str)
        return out

    # -------------------------------------------------------- instruction mode
    async def refine_triplets_instruction_based(
            self, triplets: List[Dict[str, Any]],
            subgraphs: Optional[Dict[str, str]] = None,
            global_limit: int = 25,
    ) -> Dict[str, Any]:
        """Returns the parsed 4-op dict (possibly sanitised)."""
        empty_ops = {"new_triplets": [], "inter_chunk_relations": [],
                     "merge_instructions": [], "prune_instructions": []}
        if not triplets:
            return empty_ops
        capped = triplets[:global_limit]

        context_is_empty = not subgraphs
        if subgraphs:
            subgraph_context = "\n".join(
                f"Subgraph_{i + 1}: {s}"
                for i, s in enumerate(list(subgraphs.values())[:5]))
        else:
            subgraph_context = ("No subgraph context available\n"
                                "No existing entities or relations.")

        processed = []
        for tr in capped:
            p = dict(tr)
            if p.get("source_chunks"):
                p["source_chunks"] = [
                    get_short_chunk_id(c) if isinstance(c, str) else c
                    for c in p["source_chunks"]]
            processed.append(p)

        prompt = build_instruction_prompt(
            json.dumps(processed), subgraph_context,
            self.config.max_new_triplets,
            self.config.max_inter_chunk_relations,
            self.config.max_merge_instructions,
            self.config.max_prune_instructions,
            context_is_empty=context_is_empty)
        try:
            t0 = time.perf_counter()
            raw = await self.chat.complete(
                prompt, temperature=0.0,
                max_tokens=self.config.refinement_max_tokens)
            logger.info("Instruction refinement LLM call: %.2fs "
                        "(prompt %dB)", time.perf_counter() - t0,
                        len(prompt))
        except Exception as e:
            logger.error("Instruction refinement LLM failed: %s", e)
            return {**empty_ops,
                    "new_triplets": [[t.get("head"), t.get("relation"),
                                      t.get("tail"),
                                      t.get("source_chunks", [])]
                                     for t in self._deduplicate(capped)]}
        data = parse_json_object(raw)
        if data is None:
            # Unparseable (e.g. truncated) LLM output must degrade like the
            # legacy mode — keep the deduped pre-extracted triplets instead
            # of silently dropping the whole batch (reference ladder:
            # src/components/global_refiner.py:198-233).
            logger.error("Instruction refinement output unparseable — "
                         "falling back to deduped candidates")
            return {**empty_ops,
                    "new_triplets": [[t.get("head"), t.get("relation"),
                                      t.get("tail"),
                                      t.get("source_chunks", [])]
                                     for t in self._deduplicate(capped)]}
        ops = {k: data.get(k, []) or [] for k in empty_ops}
        if context_is_empty:
            for k in ("inter_chunk_relations", "merge_instructions",
                      "prune_instructions"):
                if ops[k]:
                    logger.warning("Hallucination guard: forcing %s "
                                   "(%d items) to [] on empty context",
                                   k, len(ops[k]))
                    ops[k] = []
        # enforce configured caps
        ops["new_triplets"] = ops["new_triplets"][
            :self.config.max_new_triplets]
        ops["inter_chunk_relations"] = ops["inter_chunk_relations"][
            :self.config.max_inter_chunk_relations]
        ops["merge_instructions"] = ops["merge_instructions"][
            :self.config.max_merge_instructions]
        ops["prune_instructions"] = ops["prune_instructions"][
            :self.config.max_prune_instructions]
        return ops

    @staticmethod
    def ops_to_triplets(ops: Dict[str, Any], originals: List[Dict[str, Any]]
                        ) -> List[Dict[str, Any]]:
        """Convert new_triplets op list into triplet dicts, restoring full
        source-chunk ids from the originals where the short form matches."""
        short_to_full: Dict[str, str] = {}
        for tr in originals:
            for c in tr.get("source_chunks", []):
                if isinstance(c, str):
                    short_to_full[get_short_chunk_id(c)] = c
        out = []
        for item in ops.get("new_triplets", []):
            if not isinstance(item, (list, tuple)) or len(item) < 3:
                continue
            sources = item[3] if len(item) > 3 and isinstance(item[3], list) \
                else []
            restored = [short_to_full.get(str(s), s) for s in sources]
            out.append({"head": item[0], "relation": item[1],
                        "tail": item[2], "source_chunks": restored})
        return out
