"""Round 5: the deterministic teacher emits merge / inter-chunk / prune
operations from real subgraph-context analysis (VERDICT r4 missing #1 —
the ops machinery existed but no backend ever emitted them), and the
graph store reports emitted-vs-applied counts.

Reference contract: src/components/prompts.py:46-88 (4-op JSON),
src/components/neo4j_handler.py:451-628 (apply semantics)."""
import json

import pytest

from vidgraph_tpu.models.instruct_data import (_context_for_candidates,
                                               _entity_variant)
from vidgraph_tpu.pipeline.prompts import build_instruction_prompt
from vidgraph_tpu.services.llm_client import (LocalChatClient,
                                              _canon_entity, _canon_rel,
                                              parse_subgraph_context)


def _prompt(cands, ctx, empty=False):
    return build_instruction_prompt(json.dumps(cands), ctx, 15, 5, 4, 4,
                                    context_is_empty=empty)


def _complete(cands, ctx, empty=False):
    raw = LocalChatClient().complete_sync(_prompt(cands, ctx, empty))
    return json.loads(raw)


CTX = ("Subgraph_1: Subgraph: (Beaker / ID: 3_1)-[CONTAINS]->"
       "(Blue Liquid / ID: 3_1), (Balance / ID: 2_0)-[DISPLAYS]->"
       "(0.000 G / ID: 2_0)")


class TestCanon:
    def test_article_plural_case(self):
        assert _canon_entity("The Beakers") == _canon_entity("beaker")
        assert _canon_entity("Glass") == _canon_entity("glass")  # 'ss' kept
        assert _canon_entity("Glass Beaker") != _canon_entity("Beaker")

    def test_rel_canon(self):
        assert _canon_rel("CONTAINS") == "contain"
        assert _canon_rel("Is_On") == _canon_rel("is on")


class TestContextParse:
    def test_parse_entities_and_edges(self):
        ents, edges = parse_subgraph_context(CTX)
        assert ents == {"Beaker": "3_1", "Blue Liquid": "3_1",
                        "Balance": "2_0", "0.000 G": "2_0"}
        assert ("Balance", "DISPLAYS", "0.000 G") in edges


class TestTeacherOps:
    def test_merge_on_canonical_duplicate(self):
        cands = [{"head": "Beakers", "relation": "holds",
                  "tail": "Stirrer", "source_chunks": ["0_1"]}]
        ops = _complete(cands, CTX)
        assert ops["merge_instructions"] == [
            {"local": "Beakers", "existing": "Beaker",
             "existing_id": "3_1"}]
        # the triplet itself still lands in new_triplets (so the local
        # entity exists when the merge is applied)
        assert ["Beakers", "holds", "Stirrer", ["0_1"]] in \
            ops["new_triplets"]

    def test_no_merge_on_exact_match(self):
        cands = [{"head": "Beaker", "relation": "holds",
                  "tail": "Stirrer", "source_chunks": []}]
        ops = _complete(cands, CTX)
        assert ops["merge_instructions"] == []

    def test_prune_on_state_supersession(self):
        cands = [{"head": "Balance", "relation": "display",
                  "tail": "56.301 G", "source_chunks": ["0_0"]}]
        ops = _complete(cands, CTX)
        assert ops["prune_instructions"] == [
            {"head": "Balance", "relation": "Displays",
             "tail": "0.000 G"}]

    def test_no_prune_on_non_state_relation(self):
        ctx = ("Subgraph_1: Subgraph: (Person / ID: 1_0)-[OBSERVES]->"
               "(Flask / ID: 1_0)")
        cands = [{"head": "Person", "relation": "observes",
                  "tail": "Monitor", "source_chunks": []}]
        ops = _complete(cands, ctx)
        assert ops["prune_instructions"] == []

    def test_inter_chunk_routing(self):
        # 'Technician -> Beaker' links a NEW head to the exactly-named
        # context entity; Technician also appears in a kept new_triplet,
        # so MATCH semantics are guaranteed downstream.
        cands = [
            {"head": "Technician", "relation": "examines",
             "tail": "Beaker", "source_chunks": ["0_0"]},
            {"head": "Technician", "relation": "wears",
             "tail": "Gloves", "source_chunks": ["0_0"]},
        ]
        ops = _complete(cands, CTX)
        assert ops["inter_chunk_relations"] == [
            ["Technician", "examines", "Beaker", ["0_0"]]]
        heads = [x[0] for x in ops["new_triplets"]]
        assert "Technician" in heads
        assert ["Technician", "examines", "Beaker", ["0_0"]] not in \
            ops["new_triplets"]

    def test_inter_kept_as_new_when_head_would_not_exist(self):
        cands = [{"head": "Technician", "relation": "examines",
                  "tail": "Beaker", "source_chunks": []}]
        ops = _complete(cands, CTX)
        assert ops["inter_chunk_relations"] == []
        assert len(ops["new_triplets"]) == 1

    def test_empty_context_emits_no_ops(self):
        cands = [{"head": "Beakers", "relation": "display",
                  "tail": "Label", "source_chunks": []}]
        ops = _complete(cands, "", empty=True)
        assert ops["merge_instructions"] == []
        assert ops["prune_instructions"] == []
        assert ops["inter_chunk_relations"] == []
        assert len(ops["new_triplets"]) == 1


class TestTrainingContexts:
    def test_entity_variant_preserves_canon(self):
        import random
        rng = random.Random(0)
        for name in ("Beaker", "Blue Flask", "The Tongs", "Goggles"):
            v = _entity_variant(name, rng)
            assert v != name
            assert _canon_entity(v) == _canon_entity(name)

    def test_context_builder_matches_serve_format(self):
        import random
        rng = random.Random(1)
        cands = [{"head": "Beaker", "relation": "contains",
                  "tail": "Liquid", "source_chunks": ["0_0"]},
                 {"head": "Person", "relation": "wears",
                  "tail": "Gloves", "source_chunks": ["0_1"]}]
        for seed in range(12):
            rng = random.Random(seed)
            ctx = _context_for_candidates(cands, rng)
            ents, edges = parse_subgraph_context(ctx)
            assert ents and edges          # always parseable
            assert ctx.startswith("Subgraph_1: Subgraph: ")

    def test_training_targets_carry_ops(self):
        """Over many sampled contexts the teacher must actually emit
        each op class — the round-4 dataset had zero."""
        import random
        cands = [{"head": "Beaker", "relation": "contain",
                  "tail": "Blue Liquid", "source_chunks": ["0_0"]},
                 {"head": "Person", "relation": "wears",
                  "tail": "Gloves", "source_chunks": ["0_1"]},
                 {"head": "Person", "relation": "holds",
                  "tail": "Beaker", "source_chunks": ["0_1"]}]
        totals = {"merge_instructions": 0, "prune_instructions": 0,
                  "inter_chunk_relations": 0}
        for seed in range(40):
            ctx = _context_for_candidates(cands, random.Random(seed))
            ops = _complete(cands, ctx)
            for k in totals:
                totals[k] += len(ops[k])
        assert all(v > 0 for v in totals.values()), totals


class TestAppliedCounts:
    @pytest.fixture
    def store(self):
        from vidgraph_tpu.graph.embedded import EmbeddedGraphStore
        s = EmbeddedGraphStore("t-ops", persist_dir=None, persist=False)
        yield s
        s.close()

    def test_ops_applied_and_counted(self, store):
        batch = [{"time": "00:00-00:04", "content": "x"}]
        trips = [{"head": "Beaker", "relation": "Contains",
                  "tail": "Blue Liquid", "source_chunks": ["u_0_0"]}]
        store.add_batch_to_graph(trips, batch, 0)
        trips2 = [{"head": "Beakers", "relation": "Holds",
                   "tail": "Stirrer", "source_chunks": ["u_1_0"]},
                  {"head": "Beaker", "relation": "Contains",
                   "tail": "Red Liquid", "source_chunks": ["u_1_0"]}]
        ops = {"new_triplets": [],
               "inter_chunk_relations": [
                   ["Stirrer", "rests in", "Beaker", ["u_1_0"]]],
               "merge_instructions": [
                   {"local": "Beakers", "existing": "Beaker",
                    "existing_id": "0_0"}],
               "prune_instructions": [
                   {"head": "Beaker", "relation": "Contains",
                    "tail": "Blue Liquid"}]}
        timings = store.add_batch_to_graph(trips2, batch, 1,
                                           operations=ops)
        assert timings["ops_applied_merge"] == 1
        assert timings["ops_applied_prune"] == 1
        assert timings["ops_applied_inter"] == 1
        assert timings["ops_emitted_merge"] == 1
        assert "Beakers" not in store.entities          # merged away
        assert ("Beaker", "CONTAINS", "Blue Liquid") not in store.rels
        assert ("Stirrer", "RESTS_IN", "Beaker") in store.rels

    def test_near_miss_ops_resolve(self, store):
        """The instruct LM emits near-miss names ('beaker', 'containing');
        the store's resolution ladder grounds them to real objects instead
        of silently dropping the op (round-5 fix: real runs applied 0 of
        the LM's prunes).  Opt-in: LM chat backends only."""
        store.resolve_op_names = True
        batch = [{"time": "00:00-00:04", "content": "x"}]
        trips = [{"head": "Beaker", "relation": "Contains",
                  "tail": "Blue Liquid", "source_chunks": ["u_0_0"]},
                 {"head": "Person", "relation": "Wears",
                  "tail": "Nitrile Gloves", "source_chunks": ["u_0_0"]}]
        store.add_batch_to_graph(trips, batch, 0)
        ops = {"new_triplets": [],
               "inter_chunk_relations": [
                   ["person", "uses", "beaker", ["u_0_0"]]],
               "merge_instructions": [],
               "prune_instructions": [
                   # case near-miss names + wrong verb form
                   {"head": "beaker", "relation": "containing",
                    "tail": "blue liquid"},
                   # entity prune by case-insensitive match
                   {"entity": "nitrile gloves"}]}
        timings = store.add_batch_to_graph([], batch, 1, operations=ops)
        assert timings["ops_applied_prune"] == 2
        assert timings["ops_applied_inter"] == 1
        assert ("Beaker", "CONTAINS", "Blue Liquid") not in store.rels
        assert "Nitrile Gloves" not in store.entities
        assert ("Person", "USES", "Beaker") in store.rels

    def test_fuzzy_merge_resolves_plural(self, store):
        store.resolve_op_names = True
        batch = [{"time": "00:00-00:04", "content": "x"}]
        trips = [{"head": "Glass Beaker", "relation": "holds",
                  "tail": "Stirrer", "source_chunks": ["u_0_0"]},
                 {"head": "Glass Beakers", "relation": "contains",
                  "tail": "Liquid", "source_chunks": ["u_0_0"]}]
        store.add_batch_to_graph(trips, batch, 0)
        ops = {"new_triplets": [], "inter_chunk_relations": [],
               "merge_instructions": [
                   # 'glass beakers' != any exact name after lowering; the
                   # fuzzy rung (>=0.9) must pick the plural store entity
                   {"local": "glass beakers", "existing": "Glass Beaker",
                    "existing_id": "0_0"}],
               "prune_instructions": []}
        timings = store.add_batch_to_graph([], batch, 1, operations=ops)
        assert timings["ops_applied_merge"] == 1
        assert "Glass Beakers" not in store.entities
        assert ("Glass Beaker", "CONTAINS", "Liquid") in store.rels

    def test_ambiguous_resolution_skips(self, store):
        """Two store entities normalising identically -> the op must NOT
        pick one arbitrarily."""
        store.resolve_op_names = True
        batch = [{"time": "00:00-00:04", "content": "x"}]
        trips = [{"head": "Blue Glove", "relation": "near", "tail": "X",
                  "source_chunks": ["u_0_0"]},
                 {"head": "blue glove", "relation": "near", "tail": "Y",
                  "source_chunks": ["u_0_0"]}]
        store.add_batch_to_graph(trips, batch, 0)
        ops = {"new_triplets": [], "inter_chunk_relations": [],
               "merge_instructions": [],
               "prune_instructions": [{"entity": "BLUE GLOVE"}]}
        timings = store.add_batch_to_graph([], batch, 1, operations=ops)
        assert timings["ops_applied_prune"] == 0
        assert "Blue Glove" in store.entities
        assert "blue glove" in store.entities

    def test_resolution_off_by_default(self, store):
        """Without the opt-in flag, near-miss names keep the reference's
        exact-match semantics (skipped, not fuzzy-grounded) — the
        deterministic teacher's stale ops must not re-ground."""
        assert store.resolve_op_names is False
        batch = [{"time": "00:00-00:04", "content": "x"}]
        trips = [{"head": "Beaker", "relation": "Contains",
                  "tail": "Blue Liquid", "source_chunks": ["u_0_0"]}]
        store.add_batch_to_graph(trips, batch, 0)
        ops = {"new_triplets": [], "inter_chunk_relations": [],
               "merge_instructions": [],
               "prune_instructions": [
                   {"head": "beaker", "relation": "containing",
                    "tail": "blue liquid"}]}
        timings = store.add_batch_to_graph([], batch, 1, operations=ops)
        assert timings["ops_applied_prune"] == 0
        assert ("Beaker", "CONTAINS", "Blue Liquid") in store.rels

    def test_open_graph_store_sets_flag_from_backend(self, tmp_path):
        from vidgraph_tpu.core.config import PipelineConfig
        from vidgraph_tpu.graph import open_graph_store
        cfg = PipelineConfig()
        cfg.graph_store.persist = False
        cfg.backend.llm = "local"
        assert open_graph_store(cfg, "t-flag-a").resolve_op_names is False
        cfg.backend.llm = "tpu"
        assert open_graph_store(cfg, "t-flag-b").resolve_op_names is True

    def test_unapplicable_ops_counted_as_zero(self, store):
        batch = [{"time": "00:00-00:04", "content": "x"}]
        trips = [{"head": "A", "relation": "near", "tail": "B",
                  "source_chunks": ["u_0_0"]}]
        ops = {"new_triplets": [],
               "inter_chunk_relations": [["Ghost", "near", "A", []]],
               "merge_instructions": [
                   {"local": "Ghost", "existing": "A",
                    "existing_id": "0_0"}],
               "prune_instructions": [
                   {"head": "Ghost", "relation": "near", "tail": "A"}]}
        timings = store.add_batch_to_graph(trips, batch, 0,
                                           operations=ops)
        assert timings["ops_applied_merge"] == 0
        assert timings["ops_applied_prune"] == 0
        assert timings["ops_applied_inter"] == 0


# ---------------------------------------------------------------- grounding
class TestGroundingGuard:
    """Round 5: with grounding_text, the LLM's new_triplets are an edit
    suggestion — ungrounded triplets drop, dropped candidates restore."""

    TEXT = ("Time: 00:00-00:05\nContent: A person wearing blue nitrile "
            "gloves weighs a white powder in a glass beaker on the "
            "Mettler Toledo balance.")

    def _refine(self, reply, cands):
        import asyncio

        from vidgraph_tpu.core.config import ChunkingConfig
        from vidgraph_tpu.pipeline.refiner import GlobalRefiner

        class Chat:
            async def complete(self, prompt, **kw):
                return json.dumps(reply)

        ref = GlobalRefiner(ChunkingConfig(), Chat())
        return asyncio.run(ref.refine_triplets_instruction_based(
            cands, subgraphs={"c": "Subgraph: (X / ID: 0_0)"},
            grounding_text=self.TEXT))

    def test_hallucinated_triplets_drop_candidates_restore(self):
        cands = [{"head": "Blue Nitrile Gloves", "relation": "hold",
                  "tail": "Glass Beaker", "source_chunks": ["u_0_0"]},
                 {"head": "Balance", "relation": "weigh",
                  "tail": "White Powder", "source_chunks": ["u_0_1"]}]
        reply = {"new_triplets": [
            ["Pink Gloves", "hold", "Turquoise Syringe", ["0_0"]],
            ["Person", "wear", "Blue Nitrile Gloves", ["0_0"]]],
            "inter_chunk_relations": [], "merge_instructions": [],
            "prune_instructions": []}
        ops = self._refine(reply, cands)
        heads = [t[0] for t in ops["new_triplets"]]
        assert "Pink Gloves" not in heads          # ungrounded: dropped
        assert "Person" in heads                   # grounded LLM triplet kept
        assert "Blue Nitrile Gloves" in heads      # dropped candidate restored
        assert "Balance" in heads

    def test_candidate_reemitted_by_llm_not_duplicated(self):
        cands = [{"head": "Glass Beaker", "relation": "contain",
                  "tail": "White Powder", "source_chunks": ["u_0_0"]}]
        reply = {"new_triplets": [
            ["Glass Beaker", "hold", "White Powder", ["0_0"]]],
            "inter_chunk_relations": [], "merge_instructions": [],
            "prune_instructions": []}
        ops = self._refine(reply, cands)
        # same (head, tail) pair: the LLM's consolidation wins, candidate
        # is NOT restored alongside it
        assert len(ops["new_triplets"]) == 1
        assert ops["new_triplets"][0][1] == "hold"

    def test_ungrounded_candidates_not_restored(self):
        cands = [{"head": "Orange Gloves", "relation": "hold",
                  "tail": "Glass Beaker", "source_chunks": ["u_0_0"]}]
        reply = {"new_triplets": [], "inter_chunk_relations": [],
                 "merge_instructions": [], "prune_instructions": []}
        ops = self._refine(reply, cands)
        assert ops["new_triplets"] == []   # pre-extraction hallucination too

    def test_no_grounding_text_preserves_old_behavior(self):
        import asyncio

        from vidgraph_tpu.core.config import ChunkingConfig
        from vidgraph_tpu.pipeline.refiner import GlobalRefiner

        class Chat:
            async def complete(self, prompt, **kw):
                return json.dumps({"new_triplets": [
                    ["Pink Gloves", "hold", "Turquoise Syringe", ["0_0"]]],
                    "inter_chunk_relations": [], "merge_instructions": [],
                    "prune_instructions": []})

        ref = GlobalRefiner(ChunkingConfig(), Chat())
        ops = asyncio.run(ref.refine_triplets_instruction_based(
            [{"head": "A", "relation": "r", "tail": "B",
              "source_chunks": []}],
            subgraphs={"c": "Subgraph: (A / ID: 0_0)"}))
        assert ops["new_triplets"] == [["Pink Gloves", "hold",
                                        "Turquoise Syringe", ["0_0"]]]

    def test_entity_grounded_tokens(self):
        from vidgraph_tpu.pipeline.refiner import entity_grounded
        text = self.TEXT.lower()
        assert entity_grounded("Blue Nitrile Gloves", text)
        assert entity_grounded("the balance", text)    # stopword skipped
        assert not entity_grounded("Pink Gloves", text)
        assert not entity_grounded("", text)
        assert not entity_grounded("the", text)        # no content tokens
