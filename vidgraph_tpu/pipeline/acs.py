"""ACS Automata — network-science metrics per batch.

Metric set, names, and rounding match the reference (reference:
src/pipeline/acs_automata.py:21-324): node/edge counts, density, average
degree, unique-neighbour degree, global efficiency, average path length on
the largest component, degree/betweenness centrality, degree assortativity,
robustness under seeded 10% random node removal (edge-retention ratio),
diameter estimate, clustering coefficient, weakly connected components,
top-10-node PageRank mass, Louvain communities/modularity, label Shannon
entropy, and computational time.  The graph is all GraphNodes of the run
(entities + chunks) with every relationship between them (typed +
FROM_CHUNK), as a simple digraph.

TPU-native redesign: instead of pulling the whole graph into NetworkX every
batch, EVERY metric runs as dense XLA linear algebra in ONE fused
edge-list-fed dispatch (``_acs_fused``): BFS by repeated boolean matmul on
the MXU, exact all-pairs Brandes betweenness as while-loop matmul sweeps,
Fagiolo directed clustering, power-iteration PageRank, and parallel
Louvain (synchronous best-move + contraction, 94.5-100% of NetworkX
modularity) — all EXACT at every size where the reference falls back to
sampling.  ``acs.backend`` selects ``networkx`` / ``xla`` / ``auto``
(auto = XLA once the graph outgrows the device-dispatch overhead); the
NetworkX path remains the parity cross-check, and per-metric XLA kernels
remain as the tested fallback if the fused call ever fails.
"""
from __future__ import annotations

import functools
import math
import random
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ACSConfig
from ..core.logger import get_logger

logger = get_logger("acs_automata")

# crossover: the fused XLA pass is ~35 ms flat (one dispatch) while the
# NetworkX pass grows with the graph; below ~96 nodes NetworkX still wins
_AUTO_XLA_MIN_NODES = 96


# ---------------------------------------------------------------------------
# XLA kernels (static-shape: adjacency padded to the next multiple of 128)
# ---------------------------------------------------------------------------

def _pad_dim(n: int) -> int:
    """Power-of-two padding: the adjacency grows every batch, so rounding
    to the next 128 would force a fresh XLA compile per batch; powers of
    two bound the distinct kernel shapes to a handful per run."""
    p = 128
    while p < n:
        p *= 2
    return p


@functools.partial(jax.jit, static_argnames=("max_steps",))
def _distance_matrix(adj_u: jax.Array, valid: jax.Array, max_steps: int):
    """All-pairs shortest-path hop counts via boolean-matmul BFS.

    adj_u: [N,N] f32 0/1 (directed or undirected, no self loops, padded)
    valid: [N] f32 0/1 node mask
    Returns D [N,N] f32 with hop counts, +inf where unreachable/invalid.

    Runs as a ``lax.while_loop`` that exits as soon as the reachability
    frontier stops growing — real KG graphs have diameter ~6-15, so this
    does ~diameter matmuls instead of the static ``max_steps`` (=128)
    the round-1 scan always paid.
    """
    n = adj_u.shape[0]
    eye = jnp.eye(n, dtype=jnp.float32)
    vmask = valid[:, None] * valid[None, :]
    reach0 = jnp.minimum((eye + adj_u) * vmask, 1.0)
    dist0 = jnp.where(eye > 0, 0.0,
                      jnp.where(adj_u * vmask > 0, 1.0, jnp.inf))

    def cond(carry):
        _, _, k, grew = carry
        return (k <= max_steps + 1) & grew

    def body(carry):
        reach, dist, k, _ = carry
        new_reach = jnp.minimum(reach + reach @ adj_u, 1.0) * vmask
        newly = (new_reach > 0) & (reach == 0)
        dist = jnp.where(newly, k.astype(jnp.float32), dist)
        return (new_reach, dist, k + 1, newly.any())

    _, dist, _, _ = jax.lax.while_loop(
        cond, body, (reach0, dist0, jnp.int32(2), jnp.bool_(True)))
    return jnp.where(vmask > 0, dist, jnp.inf)


@functools.partial(jax.jit, static_argnames=("max_steps",))
def _betweenness_sweeps(adj_d: jax.Array, valid: jax.Array,
                        dist: jax.Array, max_steps: int):
    """Brandes forward/backward sweeps given precomputed hop distances.

    Forward sweep: sigma[s,v] (shortest-path counts) built level by level
    with sigma_k = (sigma_{k-1} @ A) masked to D==k.  Backward sweep:
    dependencies delta_k = sigma_k * ((1+delta_{k+1})/sigma_{k+1} @ A^T)
    masked to D==k.  bc[v] = sum_s delta[s,v], normalised by
    1/((n-1)(n-2)) (networkx directed convention, endpoints excluded).

    ``max_steps`` is the bucketed measured eccentricity (see
    ``_betweenness``), not a blanket cap — the sweeps cost
    O(eccentricity) [N,N] matmuls, ~8x fewer than the round-1 static 128.
    """
    n = adj_d.shape[0]
    vmask = valid[:, None] * valid[None, :]
    a = adj_d * vmask
    eye = jnp.eye(n, dtype=jnp.float32)

    # forward: path counts per level
    def sbody(sigma, k):
        kf = k.astype(jnp.float32)
        prev = sigma * (dist == kf - 1.0)
        sigma = sigma + (prev @ a) * (dist == kf)
        return sigma, 0

    sigma, _ = jax.lax.scan(sbody, eye, jnp.arange(1, max_steps + 1))

    # backward: dependency accumulation from the deepest level down
    def bbody(delta, k):
        kf = k.astype(jnp.float32)
        contrib = jnp.where(dist == kf + 1.0,
                            (1.0 + delta) / jnp.maximum(sigma, 1.0),
                            0.0)
        delta = delta + sigma * (contrib @ a.T) * (dist == kf)
        return delta, 0

    delta, _ = jax.lax.scan(bbody, jnp.zeros_like(sigma),
                            jnp.arange(max_steps, 0, -1))

    bc = jnp.sum(delta, axis=0)
    n_valid = valid.sum()
    denom = jnp.maximum((n_valid - 1.0) * (n_valid - 2.0), 1.0)
    return jnp.where(valid > 0, bc / denom, 0.0)


def _bucket_steps(k: int) -> int:
    """Power-of-two step bucket >= max(8, k): bounds distinct jit shapes."""
    b = 8
    while b < k:
        b *= 2
    return b


def _betweenness(adj_d: jax.Array, valid: jax.Array, max_steps: int):
    """Exact all-pairs betweenness (Brandes) as dense level-synchronised
    matmuls: directed hop distances via the early-exit BFS, then sweeps
    bounded by the MEASURED max finite level (bucketed).

    The reference could only afford k<=100 SAMPLED betweenness through
    NetworkX (reference: src/pipeline/acs_automata.py:144-151); on the MXU
    the exact computation is O(eccentricity) N^2 matmuls.
    """
    vmask = valid[:, None] * valid[None, :]
    a = adj_d * vmask
    dist = _distance_matrix(a, valid, max_steps)
    dist = jnp.where(jnp.isinf(dist), jnp.float32(-1.0), dist)
    lvl = int(jnp.max(dist))                      # host sync, one scalar
    steps = min(max_steps, _bucket_steps(max(1, lvl)))
    dist = jnp.where(dist < 0, jnp.inf, dist)
    return _betweenness_sweeps(a, valid, dist, steps)


@jax.jit
def _assortativity(adj_d: jax.Array, valid: jax.Array):
    """Directed degree assortativity (networkx convention: Pearson
    correlation of source OUT-degree vs target IN-degree over edges) as
    adjacency contractions."""
    vmask = valid[:, None] * valid[None, :]
    a = adj_d * vmask
    dout = a.sum(1)
    din = a.sum(0)
    m = jnp.maximum(a.sum(), 1.0)
    sx = jnp.sum(dout * dout)            # sum over edges of x = dout[src]
    sy = jnp.sum(din * din)              # sum over edges of y = din[dst]
    sxy = dout @ a @ din
    sxx = jnp.sum(dout ** 3)
    syy = jnp.sum(din ** 3)
    cov = sxy / m - (sx / m) * (sy / m)
    varx = sxx / m - (sx / m) ** 2
    vary = syy / m - (sy / m) ** 2
    denom = jnp.sqrt(jnp.maximum(varx * vary, 0.0))
    return jnp.where(denom > 0, cov / denom, 0.0)


@jax.jit
def _directed_clustering(adj_d: jax.Array, valid: jax.Array):
    """Fagiolo (2007) directed clustering coefficient per node — the exact
    quantity ``nx.average_clustering`` computes on a DiGraph — as three
    matmuls: C_i = (A+A^T)^3_ii / (2(d_tot(d_tot-1) - 2 d_bidir))."""
    vmask = valid[:, None] * valid[None, :]
    a = adj_d * vmask
    s = a + a.T
    s3 = s @ s @ s
    tri = jnp.diagonal(s3) / 2.0
    d_tot = a.sum(0) + a.sum(1)
    d_bi = jnp.diagonal(a @ a)
    denom = d_tot * (d_tot - 1.0) - 2.0 * d_bi
    c = jnp.where(denom > 0, tri / denom, 0.0)
    n_valid = jnp.maximum(valid.sum(), 1.0)
    return jnp.sum(jnp.where(valid > 0, c, 0.0)) / n_valid


@functools.partial(jax.jit, static_argnames=("iters",))
def _pagerank(adj_d: jax.Array, valid: jax.Array, iters: int = 50,
              damping: float = 0.85):
    """Power-iteration PageRank on the directed adjacency (dangling nodes
    redistribute uniformly), matching networkx semantics."""
    n_valid = jnp.maximum(valid.sum(), 1.0)
    out_deg = adj_d.sum(axis=1)
    dangling = (out_deg == 0) & (valid > 0)
    p = valid / n_valid

    trans = adj_d / jnp.maximum(out_deg[:, None], 1.0)

    def body(p, _):
        spread = p @ trans
        dangling_mass = jnp.sum(jnp.where(dangling, p, 0.0))
        p_new = damping * (spread + dangling_mass * valid / n_valid) \
            + (1 - damping) * valid / n_valid
        return p_new, 0

    p, _ = jax.lax.scan(body, p, jnp.arange(iters))
    return p


@functools.partial(jax.jit, static_argnames=("levels", "iters"))
def _louvain(adj_u: jax.Array, valid: jax.Array, key: jax.Array,
             levels: int = 3, iters: int = 20,
             resolution: float = 1.0):
    """Parallel Louvain community detection as dense MXU matmuls.

    Classic Louvain (reference: src/pipeline/acs_automata.py:219-233 via
    NetworkX) is sequential greedy node moves + contraction.  The XLA
    formulation replaces the sequential sweep with SYNCHRONOUS best-move
    label updates applied to a random half of the nodes per iteration
    (the standard damping trick against two-colour oscillation), then
    contracts communities and repeats.  All inner steps are [N,N]
    matmuls: S = A @ C (node->community weights), tot = k @ C (community
    degrees), gain = S - res * k_i (tot_c - k_i C_ic) / 2m.

    Returns (labels [N] int32 over original nodes, modularity f32,
    n_communities f32) — modularity evaluated on the ORIGINAL graph.
    """
    n = adj_u.shape[0]
    vmask = valid[:, None] * valid[None, :]
    a0 = adj_u * vmask
    k0 = a0.sum(axis=1)
    two_m = a0.sum()
    safe_two_m = jnp.maximum(two_m, 1e-9)
    neg = jnp.float32(-1e30)

    def local_move(a, key):
        # degrees/volume of the CURRENT (possibly contracted) graph; the
        # contraction C^T A C already doubles internal weight on the
        # diagonal, so the plain row sum IS the community degree.
        # (Dropping the diagonal instead made every merge look free and
        # collapsed the partition to one community.)
        diag = jnp.diag(a)
        k = a.sum(axis=1)
        lvl_two_m = jnp.maximum(a.sum(), 1e-9)
        labels0 = jnp.arange(n, dtype=jnp.int32)

        def body(labels, it_key):
            c = jax.nn.one_hot(labels, n, dtype=jnp.float32)
            s = (a - jnp.diag(diag)) @ c   # edges to c, self-loop excluded
            tot = k @ c
            gain = s - resolution * k[:, None] * \
                (tot[None, :] - k[:, None] * c) / lvl_two_m
            # only neighbour communities (s>0) and the current one are
            # candidate targets, as in sequential Louvain
            cand = (s > 0) | (c > 0)
            gain = jnp.where(cand, gain, neg)
            best = jnp.argmax(gain, axis=1).astype(jnp.int32)
            upd = jax.random.bernoulli(it_key, 0.5, (n,)) & (valid > 0)
            return jnp.where(upd, best, labels), 0

        labels, _ = jax.lax.scan(body, labels0,
                                 jax.random.split(key, iters))
        return labels

    glob = jnp.arange(n, dtype=jnp.int32)   # original node -> community
    a = a0
    for li in range(levels):
        key, sub = jax.random.split(key)
        lab = local_move(a, sub)
        glob = lab[glob]
        c = jax.nn.one_hot(lab, n, dtype=jnp.float32)
        a = c.T @ a @ c  # self-loops carry internal community weight

    # modularity of the final partition on the original graph
    cg = jax.nn.one_hot(glob, n, dtype=jnp.float32) * valid[:, None]
    within = jnp.diag(cg.T @ a0 @ cg)
    tot = k0 @ cg
    q = jnp.where(two_m > 0,
                  (within.sum() - resolution * (tot ** 2).sum()
                   / safe_two_m) / safe_two_m, 0.0)
    sizes = cg.sum(axis=0)
    n_comms = (sizes > 0).sum().astype(jnp.float32)
    return glob, q, n_comms


@functools.partial(jax.jit, static_argnames=("pad",))
def _acs_fused(src: jax.Array, dst: jax.Array, w: jax.Array,
               valid: jax.Array, keep: jax.Array, key: jax.Array,
               pad: int):
    """Every XLA graph metric in ONE dispatch, fed by an EDGE LIST.

    The per-metric kernels are individually correct but, through a
    tunnelled chip (~5 MB/s), each call pays a fresh multi-MB dense
    adjacency upload plus a dispatch round-trip.  This kernel uploads the
    edge list (KBs — src/dst indices padded to a power-of-two length with
    zero-weight entries), scatters the dense adjacency ON DEVICE, computes
    everything, and returns only scalars.  ``keep`` is the host-seeded
    robustness retention mask.
    """
    n = pad
    adj_d = jnp.zeros((pad, pad), jnp.float32).at[src, dst].max(w)
    vmask = valid[:, None] * valid[None, :]
    a = adj_d * vmask
    u = jnp.minimum(a + a.T, 1.0)
    n_valid = valid.sum()
    eye = jnp.eye(n, dtype=jnp.float32)
    offdiag = (1.0 - eye) * vmask

    # ---- undirected distance family -----------------------------------
    du = _distance_matrix(u, valid, n)
    finite = jnp.isfinite(du) & (vmask > 0)
    inv = jnp.where(finite & (offdiag > 0), 1.0 / jnp.maximum(du, 1e-9), 0.0)
    eff = inv.sum() / jnp.maximum(n_valid * (n_valid - 1.0), 1.0)
    sizes = (finite.astype(jnp.float32)).sum(axis=1) * valid
    wcc_count = jnp.where(valid > 0, 1.0 / jnp.maximum(sizes, 1.0), 0.0).sum()
    largest = sizes.max()
    r0 = jnp.argmax(sizes)
    member = finite[r0].astype(jnp.float32) * valid
    mm = member[:, None] * member[None, :] * offdiag
    in_cc = (mm > 0) & finite
    apl_num = jnp.where(in_cc, du, 0.0).sum()
    apl_den = in_cc.astype(jnp.float32).sum()
    apl = apl_num / jnp.maximum(apl_den, 1.0)
    diam = jnp.where(in_cc, du, 0.0).max()

    # ---- betweenness (directed, exact Brandes via while_loop sweeps) ---
    dd = _distance_matrix(a, valid, n)
    dd_f = jnp.where(jnp.isinf(dd), -1.0, dd)
    lvl = jnp.maximum(dd_f.max(), 1.0)

    def fwd_cond(c):
        return c[1] <= lvl

    def fwd_body(c):
        sigma, k = c
        prev = sigma * (dd == k - 1.0)
        return sigma + (prev @ a) * (dd == k), k + 1.0

    sigma, _ = jax.lax.while_loop(fwd_cond, fwd_body, (eye, jnp.float32(1.0)))

    def bwd_cond(c):
        return c[1] >= 1.0

    def bwd_body(c):
        delta, k = c
        contrib = jnp.where(dd == k + 1.0,
                            (1.0 + delta) / jnp.maximum(sigma, 1.0), 0.0)
        return delta + sigma * (contrib @ a.T) * (dd == k), k - 1.0

    delta, _ = jax.lax.while_loop(bwd_cond, bwd_body,
                                  (jnp.zeros_like(sigma), lvl))
    bc = jnp.sum(delta, axis=0)
    denom = jnp.maximum((n_valid - 1.0) * (n_valid - 2.0), 1.0)
    bc = jnp.where(valid > 0, bc / denom, 0.0)
    avg_bt = bc.sum() / jnp.maximum(n_valid, 1.0)
    max_bt = bc.max()

    # ---- the remaining per-metric kernels (inlined into this jit) -----
    clustering = _directed_clustering(adj_d, valid)
    pr = _pagerank(adj_d, valid)
    top10, _ = jax.lax.top_k(pr, 10)
    pr_total = pr.sum()
    pagerank_top10 = jnp.where(pr_total > 0,
                               top10.sum() / pr_total * 100.0, 0.0)
    assort = _assortativity(adj_d, valid)
    m_edges = a.sum()
    robustness = jnp.where(
        m_edges > 0,
        (a * keep[:, None] * keep[None, :]).sum() / jnp.maximum(m_edges, 1.0),
        1.0)
    _, louvain_q, louvain_k = _louvain(u, valid, key)

    # one stacked f32 vector = ONE device->host fetch (13 separate scalar
    # fetches would cost 13 tunnel round trips)
    return jnp.stack([
        eff, apl, diam.astype(jnp.float32), wcc_count, largest,
        avg_bt, max_bt, clustering, pagerank_top10, assort, robustness,
        louvain_k, louvain_q])


class ACSAutomata:
    def __init__(self, graph_store, config: Optional[ACSConfig] = None
                 ) -> None:
        self.store = graph_store
        self.config = config or ACSConfig()
        self.metrics_cache: Dict[str, Any] = {}
        self.last_update_time = 0.0

    # ------------------------------------------------------------- graph pull
    def _build_arrays(self) -> Tuple[List[str], np.ndarray, Dict[str, int]]:
        """Node list + directed simple adjacency (entities + chunks, typed
        rels + FROM_CHUNK collapsed to simple edges)."""
        s = self.store
        names = list(s.entities.keys()) + list(s.chunks.keys())
        idx = {n: i for i, n in enumerate(names)}
        n = len(names)
        adj = np.zeros((n, n), np.float32)
        for (h, _typ, t) in s.rels:
            if h in idx and t in idx:
                adj[idx[h], idx[t]] = 1.0
        for (e, c) in s.from_chunk:
            if e in idx and c in idx:
                adj[idx[e], idx[c]] = 1.0
        np.fill_diagonal(adj, 0.0)
        return names, adj, idx

    def _networkx_graph(self):
        import networkx as nx

        names, adj, _ = self._build_arrays()
        G = nx.DiGraph()
        G.add_nodes_from(range(len(names)))
        rows, cols = np.nonzero(adj)
        G.add_edges_from(zip(rows.tolist(), cols.tolist()))
        return G

    # ----------------------------------------------------------------- entry
    def update_metrics(self) -> Dict[str, Any]:
        start = time.perf_counter()
        try:
            names, adj, _ = self._build_arrays()
            n = len(names)
            m = int(adj.sum())
            backend = self.config.backend
            if backend == "auto":
                backend = "xla" if n >= _AUTO_XLA_MIN_NODES else "networkx"

            metrics = self._compute(names, adj, backend)
            metrics["computational_time"] = time.perf_counter() - start
            self.metrics_cache.update(metrics)
            self.last_update_time = time.time()
            return metrics
        except Exception as e:
            logger.error("Error computing network metrics: %s", e)
            return {"error": str(e),
                    "computational_time": time.perf_counter() - start}

    # ------------------------------------------------------------- computation
    def _compute(self, names: List[str], adj: np.ndarray, backend: str
                 ) -> Dict[str, Any]:
        import networkx as nx

        n = len(names)
        m = int(adj.sum())
        und = np.minimum(adj + adj.T, 1.0)
        np.fill_diagonal(und, 0.0)

        density = m / (n * (n - 1)) if n >= 2 else 0.0
        avg_degree = (2 * m) / n if n else 0.0
        u_deg = und.sum(axis=1)
        avg_unique_neighbors = float(u_deg.mean()) if n else 0.0

        # ---- fused XLA path: ONE device dispatch for every heavy metric ---
        fused = None
        if backend == "xla" and n >= 3 and m > 0:
            try:
                rows, cols = np.nonzero(adj)
                e = len(rows)
                # ONE compile per graph-size bucket: e_pad is a fixed
                # function of the node pad, and the node pad grows if the
                # edge count would overflow it (a larger pad is always
                # valid — the masks handle it)
                pad = _pad_dim(n)
                while 4 * pad < e:
                    pad *= 2
                e_pad = 4 * pad
                src = np.zeros(e_pad, np.int32)
                dst = np.zeros(e_pad, np.int32)
                w = np.zeros(e_pad, np.float32)
                src[:e] = rows
                dst[:e] = cols
                w[:e] = 1.0         # padding entries scatter weight 0
                v_p = np.zeros(pad, np.float32)
                v_p[:n] = 1.0
                keep = np.ones(pad, np.float32)
                if n > 10:
                    k = int(self.config.robustness_removal_fraction * n)
                    rng = random.Random(42)
                    for i in rng.sample(range(n), min(k, n)):
                        keep[i] = 0.0
                vals = _acs_fused(jnp.asarray(src), jnp.asarray(dst),
                                  jnp.asarray(w), jnp.asarray(v_p),
                                  jnp.asarray(keep),
                                  jax.random.PRNGKey(42), pad)
                fused = [float(v) for v in np.asarray(vals)]
            except Exception as e:
                logger.warning("Fused ACS kernel failed, falling back to "
                               "per-metric path: %s", e)

        # ---- distance-matrix family -------------------------------------
        if fused is not None:
            eff, apl, diam = fused[0], fused[1], int(fused[2])
            wcc_count, largest_wcc = int(round(fused[3])), int(fused[4])
            if largest_wcc < 2:
                apl = None
        elif n >= 2:
            if backend == "xla":
                eff, apl, diam, wcc_count, largest_wcc = \
                    self._distance_family_xla(adj, und)
            else:
                eff, apl, diam, wcc_count, largest_wcc = \
                    self._distance_family_nx(adj, und)
        else:
            eff, apl, diam = 0.0, None, 0
            wcc_count, largest_wcc = (1 if n else 0), n

        # ---- degree centrality -------------------------------------------
        if n >= 2:
            deg_total = adj.sum(axis=0) + adj.sum(axis=1)
            dc = deg_total / (n - 1)
            avg_dc, max_dc = float(dc.mean()), float(dc.max())
        else:
            avg_dc = max_dc = 0.0

        G = None

        def _G():
            nonlocal G
            if G is None:
                G = self._nx_from_adj(adj)
            return G

        # ---- betweenness: exact XLA Brandes, or nx sampled (reference) ----
        try:
            if fused is not None:
                avg_bt, max_bt = fused[5], fused[6]
            elif backend == "xla" and n >= 3:
                bc = self._betweenness_xla(adj)
                avg_bt = float(bc.mean())
                max_bt = float(bc.max())
            else:
                bt = nx.betweenness_centrality(
                    _G(), k=min(self.config.betweenness_k, n), seed=42)
                avg_bt = sum(bt.values()) / len(bt) if bt else 0.0
                max_bt = max(bt.values()) if bt else 0.0
        except Exception:
            avg_bt = max_bt = 0.0

        try:
            if fused is not None:
                assort = fused[9]
            elif backend == "xla" and m > 0:
                pad = _pad_dim(n)
                a = np.zeros((pad, pad), np.float32)
                a[:n, :n] = adj
                v = np.zeros(pad, np.float32)
                v[:n] = 1.0
                assort = float(_assortativity(jnp.asarray(a),
                                              jnp.asarray(v)))
            else:
                assort = nx.degree_assortativity_coefficient(_G())
            if math.isnan(assort):
                assort = 0.0
        except Exception:
            assort = 0.0

        # ---- robustness: seeded 10% node removal, edge-retention ratio ----
        try:
            if fused is not None and n > 10:
                robustness = fused[10]
            elif n > 10 and m > 0:
                k = int(self.config.robustness_removal_fraction * n)
                rng = random.Random(42)
                removed = set(rng.sample(range(n), min(k, n)))
                keep = np.asarray([i not in removed for i in range(n)])
                robustness = float(adj[np.ix_(keep, keep)].sum() / m)
            else:
                robustness = 1.0
        except Exception:
            robustness = 0.0

        # ---- clustering (directed, as nx.average_clustering on DiGraph) ---
        try:
            if fused is not None:
                clustering = fused[7]
            elif backend == "xla" and n >= 2:
                clustering = float(self._clustering_xla(adj))
            else:
                clustering = nx.average_clustering(_G())
        except Exception:
            clustering = 0.0

        # ---- pagerank top-10 mass ------------------------------------------
        try:
            if fused is not None:
                pagerank_top10 = fused[8]
            elif backend == "xla" and n >= 2:
                pr = self._pagerank_xla(adj)
                total = pr.sum()
                pagerank_top10 = float(np.sort(pr)[::-1][:10].sum()
                                       / total * 100.0) if total > 0 else 0.0
            else:
                pr = np.asarray(list(nx.pagerank(_G()).values())) \
                    if n else np.zeros(0)
                total = pr.sum()
                pagerank_top10 = float(np.sort(pr)[::-1][:10].sum()
                                       / total * 100.0) if total > 0 else 0.0
        except Exception:
            pagerank_top10 = 0.0

        # ---- louvain ---------------------------------------------------------
        # acs.louvain = "device" uses the parallel XLA formulation on the
        # xla/fused path (94.5-100% of NX modularity, community counts may
        # differ); "networkx" pins the exact seeded NetworkX Louvain for
        # reference-parity metric streams even when everything else runs
        # fused on device (it is cheap relative to the rest).
        louvain_communities, louvain_modularity = 0, 0.0
        exact_louvain = getattr(self.config, "louvain", "device") \
            == "networkx"
        try:
            if fused is not None and not exact_louvain:
                louvain_communities = int(round(fused[11]))
                louvain_modularity = fused[12]
            elif backend == "xla" and n >= 2 and not exact_louvain:
                louvain_communities, louvain_modularity = \
                    self._louvain_xla(adj)
            else:
                Gu = _G().to_undirected()
                comms = nx.community.louvain_communities(Gu, seed=42)
                louvain_communities = len(comms)
                louvain_modularity = nx.community.modularity(Gu, comms) \
                    if Gu.number_of_edges() else 0.0
        except Exception as e:
            logger.warning("Louvain computation failed: %s", e)

        label_entropy = self._label_entropy()

        return {
            "node_count": n,
            "relationship_count": m,
            "density": round(density, 4),
            "avg_degree": round(avg_degree, 4),
            "avg_unique_neighbors": round(avg_unique_neighbors, 4),
            "global_efficiency": round(eff, 4),
            "avg_path_length": round(apl, 4) if apl is not None else None,
            "avg_degree_centrality": round(avg_dc, 4),
            "max_degree_centrality": round(max_dc, 4),
            "avg_betweenness_centrality": round(avg_bt, 4),
            "max_betweenness_centrality": round(max_bt, 4),
            "degree_assortativity": round(float(assort), 4),
            "graph_robustness": round(robustness, 4),
            "diameter_estimate": int(diam),
            "clustering_coefficient": round(float(clustering), 4),
            "weakly_connected_components": int(wcc_count),
            "largest_wcc_size": int(largest_wcc),
            "pagerank_top10_percent": round(pagerank_top10, 2),
            "louvain_communities": louvain_communities,
            "louvain_modularity": (round(louvain_modularity, 4)
                                   if louvain_modularity is not None
                                   else None),
            "label_entropy": label_entropy,
        }

    @staticmethod
    def _nx_from_adj(adj: np.ndarray):
        import networkx as nx

        G = nx.DiGraph()
        G.add_nodes_from(range(adj.shape[0]))
        rows, cols = np.nonzero(adj)
        G.add_edges_from(zip(rows.tolist(), cols.tolist()))
        return G

    # -- XLA family ------------------------------------------------------------
    def _distance_family_xla(self, adj: np.ndarray, und: np.ndarray):
        n = adj.shape[0]
        pad = _pad_dim(n)
        a = np.zeros((pad, pad), np.float32)
        a[:n, :n] = und
        valid = np.zeros(pad, np.float32)
        valid[:n] = 1.0
        max_steps = min(n, 128)  # hop-count cap; graphs here are shallow
        D = np.asarray(_distance_matrix(jnp.asarray(a), jnp.asarray(valid),
                                        max_steps))[:n, :n]
        finite = np.isfinite(D)
        off = ~np.eye(n, dtype=bool)

        # efficiency over all ordered pairs (unreachable contribute 0)
        with np.errstate(divide="ignore"):
            inv = np.where(finite & off, 1.0 / np.maximum(D, 1e-9), 0.0)
        eff = float(inv[off].sum() / (n * (n - 1))) if n >= 2 else 0.0

        # components from reachability
        comp_id = np.full(n, -1)
        cid = 0
        for i in range(n):
            if comp_id[i] < 0:
                members = np.where(finite[i])[0]
                comp_id[members] = cid
                comp_id[i] = cid
                cid += 1
        sizes = np.bincount(comp_id[comp_id >= 0])
        wcc_count = len(sizes)
        largest = int(sizes.max()) if len(sizes) else 0

        # avg path length + diameter on the largest component
        if largest >= 2:
            big = np.where(comp_id == np.argmax(sizes))[0]
            sub = D[np.ix_(big, big)]
            mask = np.isfinite(sub) & ~np.eye(len(big), dtype=bool)
            apl = float(sub[mask].mean()) if mask.any() else None
            diam = int(sub[mask].max()) if mask.any() else 0
        else:
            apl, diam = None, 0
        return eff, apl, diam, wcc_count, largest

    def _distance_family_nx(self, adj: np.ndarray, und: np.ndarray):
        import networkx as nx

        n = adj.shape[0]
        G = self._nx_from_adj(adj)
        Gu = G.to_undirected()
        small = self.config.exact_efficiency_max_nodes
        if n <= small:
            eff = nx.global_efficiency(Gu)
        else:
            rng = random.Random(42)
            nodes = list(Gu.nodes())
            ssum, scount = 0.0, 0
            for _ in range(min(self.config.sample_sources, n)):
                src = rng.choice(nodes)
                lengths = nx.single_source_shortest_path_length(Gu, src)
                ssum += sum(1.0 / d for t, d in lengths.items()
                            if t != src and d > 0)
                scount += len(nodes) - 1
            eff = ssum / scount if scount else 0.0

        comps = list(nx.connected_components(Gu))
        wcc_count = len(comps)
        largest_set = max(comps, key=len) if comps else set()
        largest = len(largest_set)
        if largest >= 2:
            sub = Gu.subgraph(largest_set)
            if largest <= small:
                apl = nx.average_shortest_path_length(sub)
                try:
                    diam = nx.diameter(sub)
                except Exception:
                    diam = min(n // 2, 50)
            else:
                rng = random.Random(42)
                nodes = list(sub.nodes())
                tsum, tcount = 0.0, 0
                for _ in range(min(self.config.sample_sources, largest)):
                    src = rng.choice(nodes)
                    lengths = nx.single_source_shortest_path_length(sub, src)
                    tsum += sum(d for t, d in lengths.items() if t != src)
                    tcount += len(lengths) - 1
                apl = tsum / tcount if tcount else None
                diam = min(n // 2, 50)
        else:
            apl, diam = None, 0
        return eff, apl, diam, wcc_count, largest

    def _betweenness_xla(self, adj: np.ndarray) -> np.ndarray:
        n = adj.shape[0]
        pad = _pad_dim(n)
        a = np.zeros((pad, pad), np.float32)
        a[:n, :n] = adj
        valid = np.zeros(pad, np.float32)
        valid[:n] = 1.0
        bc = np.asarray(_betweenness(jnp.asarray(a), jnp.asarray(valid),
                                     min(n, 128)))
        return bc[:n]

    def _clustering_xla(self, adj: np.ndarray) -> float:
        n = adj.shape[0]
        pad = _pad_dim(n)
        a = np.zeros((pad, pad), np.float32)
        a[:n, :n] = adj
        valid = np.zeros(pad, np.float32)
        valid[:n] = 1.0
        return float(_directed_clustering(jnp.asarray(a),
                                          jnp.asarray(valid)))

    def _pagerank_xla(self, adj: np.ndarray) -> np.ndarray:
        n = adj.shape[0]
        pad = _pad_dim(n)
        a = np.zeros((pad, pad), np.float32)
        a[:n, :n] = adj
        valid = np.zeros(pad, np.float32)
        valid[:n] = 1.0
        pr = np.asarray(_pagerank(jnp.asarray(a), jnp.asarray(valid)))
        return pr[:n]

    def _louvain_xla(self, adj: np.ndarray):
        """Undirected parallel Louvain on device; returns
        (n_communities, modularity) matching the NetworkX call's outputs."""
        n = adj.shape[0]
        pad = _pad_dim(n)
        und = np.minimum(adj + adj.T, 1.0)
        a = np.zeros((pad, pad), np.float32)
        a[:n, :n] = und
        np.fill_diagonal(a, 0.0)
        valid = np.zeros(pad, np.float32)
        valid[:n] = 1.0
        _, q, n_comms = _louvain(jnp.asarray(a), jnp.asarray(valid),
                                 jax.random.PRNGKey(42))
        return int(n_comms), float(q)

    # -- entropy ------------------------------------------------------------------
    def _label_entropy(self) -> float:
        counts = {
            "GraphNode": len(self.store.entities) + len(self.store.chunks),
            "Entity": len(self.store.entities),
            "Chunk": len(self.store.chunks),
        }
        counts = {k: v for k, v in counts.items() if v > 0}
        total = sum(counts.values())
        if total == 0:
            return 0.0
        entropy = -sum((c / total) * math.log(c / total, 2)
                       for c in counts.values())
        return round(entropy, 4)
