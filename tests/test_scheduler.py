"""Continuous-batching scheduler tests."""
import asyncio

import numpy as np
import pytest

from vidgraph_tpu.streams.scheduler import BatchedVLMClient, \
    ContinuousBatcher


def test_concurrent_submits_coalesce():
    calls = []

    async def batch_fn(items):
        calls.append(len(items))
        await asyncio.sleep(0.005)
        return [x * 2 for x in items]

    async def run():
        b = ContinuousBatcher(batch_fn, max_batch=8, max_wait_ms=20)
        results = await asyncio.gather(*[b.submit(i) for i in range(12)])
        return results

    results = asyncio.run(run())
    assert results == [i * 2 for i in range(12)]
    # 12 items, max batch 8 -> at most 3 device calls, at least one of
    # them a real multi-item batch
    assert len(calls) <= 4
    assert max(calls) > 1


def test_priority_jumps_queue():
    order = []

    async def batch_fn(items):
        order.extend(items)
        return items

    async def run():
        b = ContinuousBatcher(batch_fn, max_batch=2, max_wait_ms=5)
        normal = [b.submit(f"n{i}") for i in range(4)]
        urgent = b.submit("URGENT", priority=0)
        await asyncio.gather(urgent, *normal)

    asyncio.run(run())
    assert "URGENT" in order[:2]


def test_batch_fn_error_propagates():
    async def batch_fn(items):
        raise ValueError("device on fire")

    async def run():
        b = ContinuousBatcher(batch_fn, max_wait_ms=1)
        with pytest.raises(ValueError):
            await b.submit(1)

    asyncio.run(run())


def test_batched_vlm_client_shares_dispatches():
    from vidgraph_tpu.services.vlm_client import LocalVLMClient

    class CountingVLM(LocalVLMClient):
        def __init__(self):
            super().__init__()
            self.batch_calls = 0

        async def caption_batch(self, chunks, system_prompt="",
                                user_prompt=""):
            self.batch_calls += 1
            return await super().caption_batch(chunks, system_prompt,
                                               user_prompt)

    inner = CountingVLM()
    client = BatchedVLMClient(inner, max_batch=8, max_wait_ms=20)
    red = np.zeros((16, 16, 3), np.uint8)
    red[:, :, 0] = 220

    async def run():
        return await asyncio.gather(*[
            client.caption([red, red]) for _ in range(6)])

    captions = asyncio.run(run())
    assert len(captions) == 6
    assert all("red" in c for c in captions)
    assert inner.batch_calls <= 2
    assert client.stats()["max_batch_size"] > 1
