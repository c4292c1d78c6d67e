"""Test harness: run everything on a virtual 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU hardware."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment may register an accelerator plugin at interpreter start
# (sitecustomize) that pins jax_platforms; force CPU for the test suite.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--run-tpu", action="store_true", default=False,
        help="run tests marked 'tpu' — they subprocess onto the real chip "
             "(exclusive device; never run two at once)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: exercises the real TPU in a subprocess; "
                   "needs --run-tpu")
    config.addinivalue_line(
        "markers", "neo4j: integration tests against a live Neo4j server; "
                   "set NEO4J_URI to enable")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-tpu"):
        return
    skip = pytest.mark.skip(reason="needs --run-tpu (real TPU, exclusive)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def cpu_mesh():
    from vidgraph_tpu.parallel import host_cpu_mesh
    return host_cpu_mesh(8)
