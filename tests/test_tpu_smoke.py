"""Real-TPU smoke for the compiled Pallas path (VERDICT r1 item 10).

The CPU test suite can only run Pallas kernels in interpret mode, so a
Mosaic lowering regression would otherwise first be discovered by the
driver's bench run.  This test subprocesses onto the real chip (the
conftest pins this process to CPU, and the axon platform must be chosen
before jax initializes) and cross-checks the compiled `cosine_topk`
against numpy.

Guarded behind ``--run-tpu``: the chip is exclusive — never run while any
other device process (bench, CLI drive) is live.
"""
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

_SMOKE = r"""
import numpy as np
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != "cpu", jax.devices()
from vidgraph_tpu.ops.topk_cosine import cosine_topk, l2_normalize, _pallas_scores, _jnp_scores
rng = np.random.default_rng(0)
store = np.asarray(l2_normalize(jnp.asarray(
    rng.normal(size=(100_000, 512)).astype(np.float32))))
q = rng.normal(size=(4, 512)).astype(np.float32)
# compiled pallas path must match the jnp path bit-for-bit on device
sp = np.asarray(_pallas_scores(jnp.asarray(q), jnp.asarray(store)))
sj = np.asarray(_jnp_scores(jnp.asarray(q), jnp.asarray(store)))
assert np.array_equal(sp, sj), float(np.abs(sp - sj).max())
# and track numpy within TPU-matmul tolerance
qn = q / np.linalg.norm(q, axis=1, keepdims=True)
ref = qn @ store.T
assert np.abs(sp - ref).max() < 2e-3, float(np.abs(sp - ref).max())
# end-to-end topk: every returned score within tolerance of the true
# k-th best (rank swaps at near-ties are fine, wrong rows are not)
scores, idx = map(np.asarray, cosine_topk(q, store, k=8))
for i in range(4):
    kth = np.sort(ref[i])[-8]
    assert scores[i].min() >= kth - 2e-3, (i, scores[i].min(), kth)
    assert np.abs(ref[i][idx[i]] - scores[i]).max() < 2e-3
print("TPU_SMOKE_OK")
"""


@pytest.mark.tpu
def test_compiled_pallas_cosine_topk_on_chip():
    env = dict(os.environ)
    # undo the conftest's CPU forcing for the child; the ambient
    # environment (sitecustomize on PYTHONPATH) selects the real platform
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    proc = subprocess.run([sys.executable, "-c", _SMOKE], env=env,
                          cwd=REPO, capture_output=True, text=True,
                          timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "TPU_SMOKE_OK" in proc.stdout
