"""HTTP serving surface tests (stdlib client against the asyncio server)."""
import asyncio
import json

import pytest

from vidgraph_tpu.core.config import PipelineConfig
from vidgraph_tpu.services.server import VideoMemoryServer


async def _http(host, port, method, path, body=None):
    reader, writer = await asyncio.open_connection(host, port)
    payload = json.dumps(body or {}).encode()
    req = (f"{method} {path} HTTP/1.1\r\nHost: x\r\n"
           f"Content-Type: application/json\r\n"
           f"Content-Length: {len(payload) if body is not None else 0}"
           f"\r\nConnection: close\r\n\r\n").encode()
    if body is not None:
        req += payload
    writer.write(req)
    await writer.drain()
    raw = await reader.read()
    writer.close()
    head, _, resp_body = raw.partition(b"\r\n\r\n")
    code = int(head.split(b" ")[1])
    return code, json.loads(resp_body)


def test_server_ingest_query_stats():
    async def run():
        cfg = PipelineConfig()
        server = VideoMemoryServer(cfg, port=0)
        await server.start()
        h, p = server.host, server.port
        code, r = await _http(h, p, "POST", "/v1/ingest", {
            "stream": "cam0", "chunk_id": "cam0_0",
            "content": "a red beaker on the lab bench",
            "time": "00:00-00:04"})
        assert code == 200 and r["ok"] and r["memory_size"] == 1
        await _http(h, p, "POST", "/v1/ingest", {
            "stream": "cam0", "chunk_id": "cam0_1",
            "content": "a blue glove near the balance"})
        code, r = await _http(h, p, "POST", "/v1/query", {
            "stream": "cam0", "query": "where is the red beaker", "k": 1})
        assert code == 200 and r["ok"]
        assert r["chunks"][0]["id"] == "cam0_0"
        code, r = await _http(h, p, "GET", "/v1/stats")
        assert r["streams"]["cam0"] == 2
        assert r["requests_served"] >= 3
        # error paths
        code, r = await _http(h, p, "POST", "/v1/query",
                              {"stream": "ghost", "query": "x"})
        assert code == 200 and not r["ok"]
        code, r = await _http(h, p, "POST", "/v1/ingest", {"stream": "s"})
        assert code == 400
        code, r = await _http(h, p, "GET", "/nope")
        assert code == 404
        await server.stop()

    asyncio.run(run())


def test_server_retrieve_endpoint(tmp_path):
    async def run():
        cfg = PipelineConfig()
        cfg.backend.llm = "local"
        cfg.graph_store.persist_dir = str(tmp_path)
        cfg.retrieval.entity_first = True
        from vidgraph_tpu.graph.embedded import EmbeddedGraphStore
        s = EmbeddedGraphStore("srv", persist_dir=str(tmp_path), dim=512)
        s.add_batch_to_graph(
            [{"head": "Person", "relation": "holds", "tail": "Beaker",
              "source_chunks": ["srv_0_0"]}],
            [{"time": "00:00-00:04", "content": "x"}], 0,
            text_chunks=[{"id": "srv_0_0",
                          "content": "person holds a beaker",
                          "index": 0}])
        s.close()
        server = VideoMemoryServer(cfg, port=0)
        await server.start()
        code, r = await _http(server.host, server.port, "POST",
                              "/v1/retrieve",
                              {"graph_uuid": "srv",
                               "query": "who holds the beaker?"})
        assert code == 200 and r["ok"]
        assert r["retrieval"].startswith("Found results")
        await server.stop()

    asyncio.run(run())
