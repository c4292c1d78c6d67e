"""In-memory fake of the neo4j Bolt driver, implementing exactly the Cypher
contract that ``vidgraph_tpu.graph.neo4j_backend`` issues (which mirrors the
reference's handler, src/components/neo4j_handler.py).

Not a Cypher engine: statements are dispatched on distinctive fragments and
executed against a dict-graph with real MERGE/DELETE semantics, so the
backend's orchestration (idempotency, fallback ladders, uuid scoping,
export/import round-trips, vector/fulltext search) is behaviourally
testable without a Bolt server.  ``supports_apoc`` toggles whether
``CALL apoc.`` statements succeed, to drive the three-rung merge ladder.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

import numpy as np


class FakeNode:
    def __init__(self, labels: List[str], props: Dict[str, Any]):
        self.labels = list(labels)
        self.props = dict(props)

    @property
    def key(self) -> str:
        return self.props.get("name") or self.props.get("id")


class FakeRel:
    def __init__(self, typ: str, src: FakeNode, dst: FakeNode,
                 props: Dict[str, Any]):
        self.typ = typ
        self.src = src
        self.dst = dst
        self.props = dict(props)


class FakeGraph:
    def __init__(self):
        self.nodes: List[FakeNode] = []
        self.rels: List[FakeRel] = []
        self.queries: List[tuple] = []   # audit trail (query, params)

    # -- helpers ------------------------------------------------------------
    def find(self, label: str, uuid: str, key_field: str,
             value: str) -> Optional[FakeNode]:
        for n in self.nodes:
            if label in n.labels and n.props.get("graph_uuid") == uuid \
                    and n.props.get(key_field) == value:
                return n
        return None

    def merge_node(self, labels: List[str], uuid: str, key_field: str,
                   value: str) -> FakeNode:
        main = "Chunk" if "Chunk" in labels else (
            "Entity" if "Entity" in labels else labels[0])
        n = self.find(main, uuid, key_field, value)
        if n is None:
            n = FakeNode(labels, {key_field: value, "graph_uuid": uuid})
            self.nodes.append(n)
        return n

    def merge_rel(self, typ: str, src: FakeNode, dst: FakeNode) -> FakeRel:
        for r in self.rels:
            if r.typ == typ and r.src is src and r.dst is dst:
                return r
        r = FakeRel(typ, src, dst, {})
        self.rels.append(r)
        return r

    def delete_node(self, node: FakeNode) -> None:
        self.nodes.remove(node)
        self.rels = [r for r in self.rels
                     if r.src is not node and r.dst is not node]


class FakeSession:
    def __init__(self, graph: FakeGraph, supports_apoc: bool):
        self.g = graph
        self.apoc = supports_apoc

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    # -- the dispatcher -------------------------------------------------------
    def run(self, query: str, **params):  # noqa: C901 - dispatcher
        self.g.queries.append((query, params))
        q = " ".join(query.split())
        g = self.g
        u = params.get("u") or params.get("uuid")

        if q == "RETURN 1":
            return iter([{"1": 1}])
        if q.startswith("CREATE CONSTRAINT") or \
                q.startswith("CREATE FULLTEXT INDEX"):
            return iter([])

        if q.startswith("MERGE (e:Entity:GraphNode"):
            n = g.merge_node(["Entity", "GraphNode"], params["uuid"],
                             "name", params["name"])
            n.props.setdefault("created_at", "2026-01-01T00:00:00")
            n.props.update(batch_time=params["bt"], batch_id=params["bi"],
                           source_chunks=params["sc"])
            return iter([])

        if q.startswith(("MATCH (h:Entity {name: $h",
                         "MATCH (h:Entity:GraphNode {name: $h")) and \
                "MERGE (h)-[r:" in q:
            typ = re.search(r"MERGE \(h\)-\[r:`([^`]+)`", q).group(1)
            h = g.find("Entity", u, "name", params["h"])
            t = g.find("Entity", u, "name", params["t"])
            if h and t:
                r = g.merge_rel(typ, h, t)
                r.props.update(graph_uuid=u, source_chunks=params["sc"],
                               batch_id=params["bi"])
            return iter([])

        if q.startswith("MERGE (c:Chunk:GraphNode"):
            n = g.merge_node(["Chunk", "GraphNode"], params["uuid"],
                             "id", params["id"])
            n.props.setdefault("created_at", "2026-01-01T00:00:00")
            n.props.update(content=params["content"], embedding=params["emb"],
                           batch_id=params["bi"], time=params["time"])
            return iter([])

        if "MERGE (e)-[:FROM_CHUNK]->(c)" in q:
            e = g.find("Entity", u, "name", params["e"])
            c = g.find("Chunk", u, "id", params["c"])
            if e and c:
                g.merge_rel("FROM_CHUNK", e, c)
            return iter([])

        if "SET e.source_chunk_ids = coalesce(e.source_chunk_ids, []) + ids" \
                in q:
            bi = params["bi"]
            for r in g.rels:
                if r.typ == "FROM_CHUNK" and \
                        r.src.props.get("graph_uuid") == u and \
                        r.dst.props.get("batch_id") == bi:
                    ids = r.src.props.setdefault("source_chunk_ids", [])
                    cid = r.dst.props["id"]
                    if cid not in ids:
                        ids.append(cid)
            return iter([])

        if "CALL apoc." in q:
            if not self.apoc:
                raise RuntimeError("APOC not available")
            lo = g.find("Entity", u, "name", params["l"])
            ex = g.find("Entity", u, "name", params["e"])
            if lo and ex and lo is not ex:
                for r in g.rels:
                    if r.src is lo:
                        r.src = ex
                    if r.dst is lo:
                        r.dst = ex
                for k, v in lo.props.items():
                    ex.props.setdefault(k, v)
                ex.props["name"] = params["e"]
                g.nodes.remove(lo)
            return iter([{"node": ex}])

        # manual-transfer rung: fetch local's rels (UNION ALL of out/in)
        if "UNION ALL" in q and "type(r) AS t" in q:
            lo = g.find("Entity", u, "name", params["l"])
            rows = []
            if lo:
                for r in g.rels:
                    if r.src is lo:
                        rows.append({"t": r.typ, "other": r.dst.key,
                                     "p": dict(r.props), "out": True})
                    elif r.dst is lo:
                        rows.append({"t": r.typ, "other": r.src.key,
                                     "p": dict(r.props), "out": False})
            return iter(rows)

        if "MERGE (e)-[nr:" in q or "MERGE (o)-[nr:" in q:
            typ = re.search(r"-\[nr:`([^`]+)`\]->", q).group(1)
            e = g.find("Entity", u, "name", params["e"])
            other = None
            for n in g.nodes:
                if n.props.get("graph_uuid") == u and \
                        n.key == params["o"]:
                    other = n
                    break
            if e and other:
                src, dst = (e, other) if "MERGE (e)-[nr:" in q \
                    else (other, e)
                r = g.merge_rel(typ, src, dst)
                r.props.update(params["p"])
                r.props["graph_uuid"] = u
            return iter([])

        if "e.merged_from = coalesce(e.merged_from, []) + $l" in q:
            lo = g.find("Entity", u, "name", params["l"])
            ex = g.find("Entity", u, "name", params["e"])
            if lo and ex:
                ex.props["source_chunk_ids"] = (
                    ex.props.get("source_chunk_ids", [])
                    + lo.props.get("source_chunk_ids", []))
                ex.props["merged_from"] = (
                    ex.props.get("merged_from", []) + [params["l"]])
                g.delete_node(lo)
            return iter([])

        if q.startswith("MATCH (l:Entity:GraphNode {name: $l") and \
                "DETACH DELETE l" in q:
            lo = g.find("Entity", u, "name", params["l"])
            if lo:
                g.delete_node(lo)
            return iter([])

        if q.startswith("MATCH (n:Entity:GraphNode {name: $n") and \
                "DETACH DELETE n" in q:
            n = g.find("Entity", u, "name", params["n"])
            if n:
                g.delete_node(n)
            return iter([])

        if re.search(r"-\[r:`[^`]+`\]-\(t:Entity:GraphNode", q) and \
                "DELETE r" in q:
            typ = re.search(r"-\[r:`([^`]+)`\]-", q).group(1)
            keep = []
            for r in g.rels:
                names = {r.src.props.get("name"), r.dst.props.get("name")}
                if r.typ == typ and params["h"] in names and \
                        params["t"] in names and \
                        r.src.props.get("graph_uuid") == u:
                    continue
                keep.append(r)
            g.rels = keep
            return iter([])

        if "NOT (n)--()" in q:
            linked = set()
            for r in g.rels:
                linked.add(id(r.src))
                linked.add(id(r.dst))
            for n in list(g.nodes):
                if "Entity" in n.labels and \
                        n.props.get("graph_uuid") == u and \
                        id(n) not in linked:
                    g.nodes.remove(n)
            return iter([])

        if "RETURN count(n) AS c" in q and "(n:GraphNode)" in q:
            c = sum(1 for n in g.nodes if n.props.get("graph_uuid") == u)
            return iter([{"c": c}])
        if "MATCH ()-[r]->() WHERE r.graph_uuid" in q:
            c = sum(1 for r in g.rels if r.props.get("graph_uuid") == u)
            return iter([{"c": c}])
        if "MATCH (c:Chunk:GraphNode) WHERE c.graph_uuid=$u" in q:
            chunks = [n for n in g.nodes if "Chunk" in n.labels
                      and n.props.get("graph_uuid") == u]
            if "c.embedding IS NOT NULL" in q:
                chunks = [c for c in chunks
                          if c.props.get("embedding") is not None]
            return iter([{"c": len(chunks)}])
        if "<-[:FROM_CHUNK]-" in q and "count(DISTINCT c)" in q:
            ids = {id(r.dst) for r in g.rels if r.typ == "FROM_CHUNK"
                   and r.dst.props.get("graph_uuid") == u}
            return iter([{"c": len(ids)}])

        if "vector.similarity.cosine" in q:
            qv = np.asarray(params["q"], np.float32)
            qv = qv / (np.linalg.norm(qv) + 1e-12)
            rows = []
            for n in g.nodes:
                if "Chunk" not in n.labels or \
                        n.props.get("graph_uuid") != u or \
                        n.props.get("embedding") is None:
                    continue
                v = np.asarray(n.props["embedding"], np.float32)
                sim = float(qv @ (v / (np.linalg.norm(v) + 1e-12)))
                if sim > params["thr"]:
                    rows.append({"id": n.props["id"],
                                 "time": n.props.get("time"),
                                 "content": n.props.get("content"),
                                 "score": sim})
            rows.sort(key=lambda r: -r["score"])
            return iter(rows[: params["k"]])

        if "db.index.fulltext.queryNodes" in q:
            terms = {t.lower() for t in re.findall(r"\w+", params["q"])}
            rows = []
            for n in g.nodes:
                if "Entity" not in n.labels or \
                        n.props.get("graph_uuid") != u:
                    continue
                toks = {t.lower()
                        for t in re.findall(r"\w+", n.props["name"])}
                score = len(terms & toks)
                if score:
                    rows.append({"name": n.props["name"],
                                 "bt": n.props.get("batch_time"),
                                 "score": float(score)})
            rows.sort(key=lambda r: -r["score"])
            return iter(rows[: params["k"]])

        if "MATCH path = (e)-[*1.." in q:
            hops = int(re.search(r"\[\*1\.\.(\d+)\]", q).group(1))
            start = g.find("Entity", u, "name", params["n"])
            if not start:
                return iter([])
            frontier, seen_nodes, sub_rels = {id(start): start}, \
                {id(start): start}, []
            for _ in range(hops):
                nxt = {}
                for r in g.rels:
                    for a, b in ((r.src, r.dst), (r.dst, r.src)):
                        if id(a) in frontier and \
                                b.props.get("graph_uuid") == u:
                            if r not in sub_rels:
                                sub_rels.append(r)
                            if id(b) not in seen_nodes:
                                nxt[id(b)] = b
                seen_nodes.update(nxt)
                frontier = nxt
            rows = []
            for r in sub_rels:
                for n in (r.src, r.dst):
                    if n is start:
                        continue
                    rows.append({
                        "name": n.props.get("name"),
                        "id": n.props.get("id"),
                        "bt": n.props.get("batch_time"),
                        "content": n.props.get("content"),
                        "time": n.props.get("time"),
                        "labels": list(n.labels),
                        "rt": r.typ,
                        "sn": r.src.key, "en": r.dst.key})
            return iter(rows)

        if "RETURN c.id AS id, c.embedding AS emb" in q:
            rows = [{"id": n.props["id"], "emb": n.props["embedding"]}
                    for n in g.nodes
                    if "Chunk" in n.labels
                    and n.props.get("graph_uuid") == u
                    and n.props.get("embedding") is not None]
            return iter(rows[: params["l"]])

        if q.startswith("MATCH (c:Chunk {id: $id") and \
                "properties(c)" in q:
            c = g.find("Chunk", u, "id", params["id"])
            return iter([{"p": dict(c.props)}] if c else [])
        if q.startswith("MATCH (e:Entity {name: $n") and \
                "properties(e)" in q:
            e = g.find("Entity", u, "name", params["n"])
            return iter([{"p": dict(e.props)}] if e else [])
        if "MATCH (e:Entity)-[:FROM_CHUNK]->(c:Chunk {id: $id" in q:
            names = sorted(r.src.props["name"] for r in g.rels
                           if r.typ == "FROM_CHUNK"
                           and r.dst.props.get("id") == params["id"]
                           and r.dst.props.get("graph_uuid") == u)
            return iter([{"n": n} for n in names])
        if "$c IN coalesce(e.source_chunk_ids, [])" in q:
            return iter([{"n": n.props["name"]} for n in g.nodes
                         if "Entity" in n.labels
                         and n.props.get("graph_uuid") == u
                         and params["c"]
                         in n.props.get("source_chunk_ids", [])])
        if "WHERE h.name = $n OR t.name = $n" in q:
            rows = []
            for r in g.rels:
                if r.typ == "FROM_CHUNK":
                    continue
                if r.src.props.get("graph_uuid") != u:
                    continue
                if params["n"] in (r.src.props.get("name"),
                                   r.dst.props.get("name")):
                    rows.append({"h": r.src.props.get("name"),
                                 "typ": r.typ,
                                 "t": r.dst.props.get("name"),
                                 "p": dict(r.props)})
            return iter(rows)

        if "RETURN n.name AS name, labels(n) AS labels" in q:
            return iter([{"name": n.props.get("name"),
                          "labels": list(n.labels),
                          "props": dict(n.props)}
                         for n in g.nodes
                         if n.props.get("graph_uuid") == u])
        if "RETURN type(rel) AS t, a.name AS f" in q:
            return iter([{"t": r.typ, "f": r.src.props.get("name"),
                          "to": r.dst.key, "p": dict(r.props)}
                         for r in g.rels
                         if r.src.props.get("graph_uuid") == u])

        m = re.match(r"MERGE \(n:((?:`[^`]+`:?)+) \{(\w+): \$v", q)
        if m:
            labels = [p.strip("`") for p in m.group(1).split(":")]
            key = m.group(2)
            n = g.merge_node(labels, u, key, params["v"])
            n.labels = labels
            n.props.update(params["props"])
            return iter([])
        if "WHERE a.name = $f OR a.id = $f" in q:
            typ = re.search(r"MERGE \(a\)-\[r:`([^`]+)`\]->\(b\)",
                            q).group(1)
            a = b = None
            for n in g.nodes:
                if n.props.get("graph_uuid") != u:
                    continue
                if n.key == params["f"]:
                    a = n
                if n.key == params["t"]:
                    b = n
            if a and b:
                r = g.merge_rel(typ, a, b)
                r.props.update(params["props"])
            return iter([])

        raise NotImplementedError(f"fake neo4j: unhandled query: {q[:140]}")


class FakeDriver:
    def __init__(self, graph: Optional[FakeGraph] = None,
                 supports_apoc: bool = False,
                 fail_manual_merge: bool = False):
        self.graph = graph or FakeGraph()
        self.supports_apoc = supports_apoc
        self.fail_manual_merge = fail_manual_merge

    def session(self, database=None):
        s = FakeSession(self.graph, self.supports_apoc)
        if self.fail_manual_merge:
            orig = s.run

            def run(query, **params):
                if "UNION ALL" in query:
                    raise RuntimeError("manual merge disabled")
                return orig(query, **params)

            s.run = run
        return s

    def close(self):
        pass


def install(monkeypatch, **kw) -> FakeDriver:
    """Patch ``neo4j.GraphDatabase.driver`` to return a FakeDriver (creating
    a stub ``neo4j`` module if the real driver is absent)."""
    import sys
    import types

    drv = FakeDriver(**kw)
    mod = types.ModuleType("neo4j")

    class GraphDatabase:
        @staticmethod
        def driver(uri, auth=None):
            return drv

    mod.GraphDatabase = GraphDatabase
    monkeypatch.setitem(sys.modules, "neo4j", mod)
    return drv
