"""Opt-in integration suite against a REAL Neo4j server (VERDICT r2 #8).

Runs the same behavioural checks as tests/test_neo4j_backend.py (minus
the fake-driver rung introspection) against a live Bolt endpoint, so the
Bolt backend does not depend solely on tests/fake_neo4j.py.

Enable by exporting ``NEO4J_URI`` (e.g. ``bolt://localhost:7687``);
``NEO4J_USER`` / ``NEO4J_PASSWORD`` / ``NEO4J_DATABASE`` optional
(defaults neo4j / password / neo4j — matching docker/docker-compose.yml).
Each test isolates under a fresh ``graph_uuid`` and deletes its nodes on
teardown, so the suite is safe against a shared server.  Skipped cleanly
when ``NEO4J_URI`` is unset (this repository's CI has no Bolt service).

Reference semantics under test: /root/reference/src/components/
neo4j_handler.py:451-663 (merge ladder, prune, inter-chunk relations)
plus vector/fulltext search and export/import v1.0.
"""
import os
import uuid as _uuid

import pytest

from test_neo4j_backend import (check_accessors, check_export_import,
                                check_fulltext_search, check_inter_chunk,
                                check_merge_applies, check_merge_idempotent,
                                check_prune, check_source_chunk_ids,
                                check_traversal, check_vector_search)

pytestmark = [
    pytest.mark.neo4j,
    pytest.mark.skipif("NEO4J_URI" not in os.environ,
                       reason="set NEO4J_URI to run against a live server"),
]


@pytest.fixture
def live():
    """Factory for stores on the live server; cleans up every uuid used."""
    from vidgraph_tpu.core.config import Neo4jConfig
    from vidgraph_tpu.graph.neo4j_backend import Neo4jGraphStore

    cfg = Neo4jConfig(
        uri=os.environ["NEO4J_URI"],
        user=os.environ.get("NEO4J_USER", "neo4j"),
        password=os.environ.get("NEO4J_PASSWORD", "password"),
        database=os.environ.get("NEO4J_DATABASE", "neo4j"),
    )
    stores = []

    def make():
        store = Neo4jGraphStore(f"it-{_uuid.uuid4().hex[:12]}", cfg)
        if not store.verify_connection():
            pytest.skip(f"cannot reach Neo4j at {cfg.uri}")
        store.create_indexes()
        stores.append(store)
        return store

    yield make
    for store in stores:
        try:
            store._run("MATCH (n:GraphNode {graph_uuid: $u}) DETACH DELETE n",
                       u=store.graph_uuid)
        finally:
            store.close()


def test_live_merge_idempotent(live):
    check_merge_idempotent(live())


def test_live_source_chunk_ids(live):
    check_source_chunk_ids(live())


def test_live_merge_applies(live):
    check_merge_applies(live())


def test_live_prune(live):
    check_prune(live())


def test_live_inter_chunk_relations(live):
    check_inter_chunk(live())


def test_live_vector_search(live):
    check_vector_search(live())


def test_live_fulltext_search(live):
    check_fulltext_search(live())


def test_live_traversal(live):
    check_traversal(live())


def test_live_accessors(live):
    check_accessors(live())


def test_live_export_import(live):
    check_export_import(live(), live())
