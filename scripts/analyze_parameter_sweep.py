#!/usr/bin/env python3
"""Statistical analysis + figure suite for a parameter sweep.

Full equivalent of reference scripts/analyze_parameter_sweep.py:
descriptive statistics, Spearman correlations, random-forest permutation
importance, OLS regression (scipy/numpy — statsmodels is not in this
image), optimal-configuration search, one-way ANOVA across parameter
terciles with **Tukey HSD post-hoc** (reference :374), and a 15-figure
suite including the network-science figures driven by the per-epoch
batch-metrics files (`epoch_NNN_batch_metrics.json` copied by
run_parameter_sweep.py): small-world analysis (reference :908),
graph-size scaling (:978), network-health dashboard (:1059), and the
8-panel conference figure (:1112).  Driven by ``sweep_summary.json``.
"""
from __future__ import annotations

import argparse
import json
import math
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

PARAMS = ["chunk_size", "chunk_overlap", "max_triplets_per_chunk",
          "global_triplet_limit", "max_new_triplets"]
METRICS = ["accuracy", "avg_retrieval_time"]

# final-graph network metrics pulled from the last batch of each epoch
NET_FINAL = ["node_count", "relationship_count", "density", "avg_degree",
             "clustering_coefficient", "avg_path_length",
             "global_efficiency", "louvain_modularity",
             "louvain_communities", "graph_robustness",
             "degree_assortativity", "pagerank_top10_percent",
             "label_entropy", "weakly_connected_components"]


# --------------------------------------------------------------------- load
def load_frame(summary_path: str):
    import pandas as pd

    data = json.loads(Path(summary_path).read_text())
    rows = []
    for e in data.get("epochs", []):
        if e.get("accuracy") is None:
            continue
        rows.append({"epoch": e["epoch"], **e.get("params", {}),
                     "accuracy": e["accuracy"],
                     "avg_retrieval_time": e.get("avg_retrieval_time"),
                     "elapsed_s": e.get("elapsed_s")})
    return pd.DataFrame(rows)


def load_network_metrics(df, sweep_dir: Path):
    """Attach final-graph network metrics (and the full per-batch series)
    from each epoch's copied batch-metrics file."""
    series: Dict[int, List[Dict]] = {}
    finals: List[Dict[str, Any]] = []
    for _, row in df.iterrows():
        ep = int(row["epoch"])
        path = sweep_dir / f"epoch_{ep:03d}_batch_metrics.json"
        rec: Dict[str, Any] = {"epoch": ep}
        if path.exists():
            bm = json.loads(path.read_text())
            if isinstance(bm, dict):
                bm = bm.get("batch_metrics", [])
            if bm:
                series[ep] = bm
                last = bm[-1].get("network_metrics", {})
                for k in NET_FINAL:
                    if k in last:
                        rec[k] = last[k]
                rec["kg_build_s"] = sum(b.get("total_time", 0) for b in bm)
        finals.append(rec)
    import pandas as pd

    net = pd.DataFrame(finals)
    merged = df.merge(net, on="epoch", how="left")
    return merged, series


# ---------------------------------------------------------------- statistics
def descriptive_stats(df) -> Dict[str, Any]:
    return json.loads(df.describe().to_json())


def correlations(df, extra: Optional[List[str]] = None):
    cols = [c for c in PARAMS + METRICS + (extra or []) if c in df.columns]
    sub = df[cols].dropna(axis=1, how="all")
    return sub.corr(method="spearman")


def rf_importance(df) -> Optional[Dict[str, float]]:
    try:
        from sklearn.ensemble import RandomForestRegressor
        from sklearn.inspection import permutation_importance
    except ImportError:
        return None
    cols = [c for c in PARAMS if c in df.columns]
    if len(df) < 5 or not cols:
        return None
    X, y = df[cols].values, df["accuracy"].values
    rf = RandomForestRegressor(n_estimators=200, random_state=42).fit(X, y)
    imp = permutation_importance(rf, X, y, n_repeats=10, random_state=42)
    return dict(zip(cols, imp.importances_mean.round(4).tolist()))


def ols_regression(df) -> Optional[Dict[str, Any]]:
    """OLS accuracy ~ params via numpy lstsq with t-test p-values."""
    from scipy import stats as sps

    cols = [c for c in PARAMS if c in df.columns and df[c].nunique() > 1]
    n = len(df)
    k = len(cols) + 1
    if n <= k + 1 or not cols:
        return None
    X = np.column_stack([np.ones(n)] + [df[c].astype(float) for c in cols])
    y = df["accuracy"].astype(float).values
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    dof = n - k
    sigma2 = float(resid @ resid) / max(dof, 1)
    try:
        cov = sigma2 * np.linalg.inv(X.T @ X)
        se = np.sqrt(np.diag(cov))
        tvals = beta / np.where(se > 0, se, np.inf)
        pvals = 2 * sps.t.sf(np.abs(tvals), dof)
    except np.linalg.LinAlgError:
        se = np.full(k, np.nan)
        pvals = np.full(k, np.nan)
    ss_tot = float(((y - y.mean()) ** 2).sum())
    r2 = 1.0 - float(resid @ resid) / ss_tot if ss_tot else 0.0
    names = ["const"] + cols
    return {"r_squared": round(r2, 4),
            "params": {nm: round(float(b), 6)
                       for nm, b in zip(names, beta)},
            "pvalues": {nm: (round(float(p), 4) if np.isfinite(p) else None)
                        for nm, p in zip(names, pvals)}}


def optimal_config(df) -> Dict[str, Any]:
    best = df.loc[df["accuracy"].idxmax()]
    return {k: (float(best[k]) if k in best and best[k] == best[k] else None)
            for k in PARAMS + METRICS + ["epoch"]}


def _tercile_groups(df, param):
    vals = df[param].astype(float)
    if vals.nunique() < 3:
        qs = sorted(vals.unique())
        return [(str(q), df[vals == q]["accuracy"].values) for q in qs]
    q1, q2 = vals.quantile([1 / 3, 2 / 3])
    return [("low", df[vals <= q1]["accuracy"].values),
            ("mid", df[(vals > q1) & (vals <= q2)]["accuracy"].values),
            ("high", df[vals > q2]["accuracy"].values)]


def anova(df) -> Dict[str, Any]:
    """One-way ANOVA of accuracy across parameter terciles."""
    from scipy import stats

    out = {}
    for p in PARAMS:
        if p not in df.columns or df[p].nunique() < 2:
            continue
        groups = [g for _, g in _tercile_groups(df, p) if len(g) > 1]
        if len(groups) >= 2:
            f, pv = stats.f_oneway(*groups)
            out[p] = {"f": round(float(f), 4), "p": round(float(pv), 4)}
    return out


def tukey_hsd_posthoc(df) -> Dict[str, Any]:
    """Tukey HSD pairwise post-hoc across parameter terciles
    (reference scripts/analyze_parameter_sweep.py:374)."""
    from scipy.stats import tukey_hsd as scipy_tukey

    out: Dict[str, Any] = {}
    for p in PARAMS:
        if p not in df.columns or df[p].nunique() < 2:
            continue
        named = [(n, g) for n, g in _tercile_groups(df, p) if len(g) > 1]
        if len(named) < 2:
            continue
        names = [n for n, _ in named]
        res = scipy_tukey(*[g for _, g in named])
        pairs = []
        for i in range(len(named)):
            for j in range(i + 1, len(named)):
                pairs.append({
                    "groups": f"{names[i]} vs {names[j]}",
                    "mean_diff": round(float(np.mean(named[i][1])
                                             - np.mean(named[j][1])), 4),
                    "p_adj": round(float(res.pvalue[i, j]), 4),
                    "significant": bool(res.pvalue[i, j] < 0.05)})
        out[p] = pairs
    return out


# ------------------------------------------------------------------- figures
def _save(fig, out_dir: Path, name: str, written: List[str]):
    import matplotlib.pyplot as plt

    p = out_dir / name
    fig.tight_layout()
    fig.savefig(p, dpi=120)
    plt.close(fig)
    written.append(str(p))


def fig_accuracy_per_epoch(df, out_dir, written):
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(df["epoch"], df["accuracy"], "o-")
    ax.set_xlabel("epoch")
    ax.set_ylabel("accuracy")
    ax.set_title("Benchmark accuracy per sweep epoch")
    _save(fig, out_dir, "accuracy_per_epoch.png", written)


def fig_accuracy_vs_params(df, out_dir, written):
    import matplotlib.pyplot as plt

    cols = [c for c in PARAMS if c in df.columns]
    if not cols:
        return
    fig, axes = plt.subplots(1, len(cols), figsize=(3.2 * len(cols), 3.2))
    for ax, c in zip(np.atleast_1d(axes), cols):
        ax.scatter(df[c], df["accuracy"], alpha=0.7)
        ax.set_xlabel(c)
        ax.set_ylabel("accuracy")
    _save(fig, out_dir, "accuracy_vs_params.png", written)


def fig_correlation_heatmap(df, out_dir, written, extra=None,
                            name="correlation_heatmap.png",
                            title="Spearman correlations"):
    import matplotlib.pyplot as plt

    corr = correlations(df, extra)
    fig, ax = plt.subplots(figsize=(max(6, 0.6 * len(corr)),
                                    max(5, 0.55 * len(corr))))
    im = ax.imshow(corr.values, cmap="coolwarm", vmin=-1, vmax=1)
    ax.set_xticks(range(len(corr.columns)))
    ax.set_xticklabels(corr.columns, rotation=45, ha="right", fontsize=8)
    ax.set_yticks(range(len(corr.columns)))
    ax.set_yticklabels(corr.columns, fontsize=8)
    fig.colorbar(im)
    ax.set_title(title)
    _save(fig, out_dir, name, written)


def fig_accuracy_vs_latency(df, out_dir, written):
    import matplotlib.pyplot as plt

    if not df["avg_retrieval_time"].notna().any():
        return
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.scatter(df["avg_retrieval_time"], df["accuracy"], alpha=0.7)
    best = df.loc[df["accuracy"].idxmax()]
    ax.scatter([best["avg_retrieval_time"]], [best["accuracy"]],
               marker="*", s=220, color="crimson", label="best")
    ax.set_xlabel("avg retrieval time (s)")
    ax.set_ylabel("accuracy")
    ax.set_title("Accuracy vs retrieval latency")
    ax.legend()
    _save(fig, out_dir, "accuracy_vs_latency.png", written)


def fig_metric_distributions(df, out_dir, written):
    import matplotlib.pyplot as plt

    cols = [c for c in METRICS + ["elapsed_s"]
            if c in df.columns and df[c].notna().any()]
    fig, axes = plt.subplots(1, len(cols), figsize=(3.6 * len(cols), 3.2))
    for ax, c in zip(np.atleast_1d(axes), cols):
        ax.hist(df[c].dropna(), bins=min(12, max(4, len(df) // 2)),
                alpha=0.8, edgecolor="black")
        ax.set_xlabel(c)
        ax.set_ylabel("epochs")
    fig.suptitle("Outcome metric distributions")
    _save(fig, out_dir, "metric_distributions.png", written)


def fig_parameter_effects(df, out_dir, written):
    import matplotlib.pyplot as plt

    cols = [c for c in PARAMS if c in df.columns and df[c].nunique() > 1]
    if not cols:
        return
    fig, axes = plt.subplots(1, len(cols), figsize=(3.2 * len(cols), 3.2),
                             sharey=True)
    for ax, c in zip(np.atleast_1d(axes), cols):
        named = _tercile_groups(df, c)
        xs = range(len(named))
        means = [g.mean() if len(g) else np.nan for _, g in named]
        stds = [g.std() if len(g) > 1 else 0.0 for _, g in named]
        ax.errorbar(xs, means, yerr=stds, fmt="o-", capsize=4)
        ax.set_xticks(list(xs))
        ax.set_xticklabels([n for n, _ in named])
        ax.set_xlabel(c)
    np.atleast_1d(axes)[0].set_ylabel("accuracy (mean ± std)")
    fig.suptitle("Per-parameter effects (terciles)")
    _save(fig, out_dir, "parameter_effects.png", written)


def fig_pairwise_interactions(df, out_dir, written, importance=None):
    import matplotlib.pyplot as plt

    cols = [c for c in PARAMS if c in df.columns and df[c].nunique() > 1]
    if len(cols) < 2:
        return
    if importance:
        cols = sorted(cols, key=lambda c: -importance.get(c, 0.0))
    a, b = cols[0], cols[1]
    fig, ax = plt.subplots(figsize=(5.4, 4.4))
    sc = ax.scatter(df[a], df[b], c=df["accuracy"], cmap="viridis",
                    s=90, edgecolor="black")
    fig.colorbar(sc, label="accuracy")
    ax.set_xlabel(a)
    ax.set_ylabel(b)
    ax.set_title(f"Interaction: {a} x {b}")
    _save(fig, out_dir, "pairwise_interactions.png", written)


def fig_boxplots_by_parameter(df, out_dir, written):
    import matplotlib.pyplot as plt

    cols = [c for c in PARAMS if c in df.columns and df[c].nunique() > 1]
    if not cols:
        return
    fig, axes = plt.subplots(1, len(cols), figsize=(3.2 * len(cols), 3.4),
                             sharey=True)
    for ax, c in zip(np.atleast_1d(axes), cols):
        named = [(n, g) for n, g in _tercile_groups(df, c) if len(g)]
        ax.boxplot([g for _, g in named],
                   tick_labels=[n for n, _ in named])
        ax.set_xlabel(c)
    np.atleast_1d(axes)[0].set_ylabel("accuracy")
    fig.suptitle("Accuracy distribution by parameter tercile")
    _save(fig, out_dir, "boxplots_by_parameter.png", written)


def fig_build_time_analysis(df, out_dir, written):
    import matplotlib.pyplot as plt

    if "kg_build_s" not in df.columns or not df["kg_build_s"].notna().any():
        return
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 3.6))
    ax1.bar(df["epoch"], df["kg_build_s"], alpha=0.8)
    ax1.set_xlabel("epoch")
    ax1.set_ylabel("KG build time (s)")
    ax2.scatter(df["kg_build_s"], df["accuracy"], alpha=0.8)
    ax2.set_xlabel("KG build time (s)")
    ax2.set_ylabel("accuracy")
    fig.suptitle("Build-time analysis")
    _save(fig, out_dir, "build_time_analysis.png", written)


def fig_network_topology_vs_accuracy(df, out_dir, written):
    import matplotlib.pyplot as plt

    cols = [c for c in ("density", "clustering_coefficient",
                        "louvain_modularity", "avg_degree",
                        "global_efficiency", "graph_robustness")
            if c in df.columns and df[c].notna().any()]
    if not cols:
        return
    fig, axes = plt.subplots(2, 3, figsize=(11, 6.4))
    for ax, c in zip(axes.ravel(), cols):
        ax.scatter(df[c], df["accuracy"], alpha=0.8)
        ax.set_xlabel(c)
        ax.set_ylabel("accuracy")
    for ax in axes.ravel()[len(cols):]:
        ax.axis("off")
    fig.suptitle("Final-graph topology vs benchmark accuracy")
    _save(fig, out_dir, "network_topology_vs_accuracy.png", written)


def fig_network_metrics_correlation(df, out_dir, written):
    cols = [c for c in NET_FINAL if c in df.columns
            and df[c].notna().any()]
    if not cols:
        return
    fig_correlation_heatmap(
        df, out_dir, written, extra=cols,
        name="network_metrics_correlation.png",
        title="Params + network metrics + outcomes (Spearman)")


def small_world_sigma(n, k, c_obs, l_obs):
    """sigma = (C/C_rand)/(L/L_rand) with Erdos-Renyi equivalents."""
    if not n or not k or k <= 1 or n <= math.e:
        return None
    c_rand = k / n
    l_rand = math.log(n) / math.log(k)
    if not c_rand or not l_rand or not l_obs:
        return None
    if not c_obs:
        return 0.0
    return (c_obs / c_rand) / (l_obs / l_rand)


def fig_small_world_analysis(df, out_dir, written):
    """Small-world index per epoch (reference :908)."""
    import matplotlib.pyplot as plt

    need = ("node_count", "avg_degree", "clustering_coefficient",
            "avg_path_length")
    if not all(c in df.columns and df[c].notna().any() for c in need):
        return
    sigmas = [small_world_sigma(r["node_count"], r["avg_degree"],
                                r["clustering_coefficient"],
                                r["avg_path_length"])
              for _, r in df.iterrows()]
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9.2, 3.8))
    ax1.scatter(df["clustering_coefficient"], df["avg_path_length"],
                c=df["accuracy"], cmap="viridis", s=80, edgecolor="black")
    ax1.set_xlabel("clustering coefficient C")
    ax1.set_ylabel("avg path length L")
    ax1.set_title("C vs L (colour = accuracy)")
    xs = [s for s in sigmas if s is not None]
    eps = [e for e, s in zip(df["epoch"], sigmas) if s is not None]
    ax2.bar(eps, xs, alpha=0.85)
    ax2.axhline(1.0, color="crimson", linestyle="--",
                label="sigma = 1 (random)")
    ax2.set_xlabel("epoch")
    ax2.set_ylabel("small-world sigma")
    ax2.legend()
    fig.suptitle("Small-world analysis of the final graphs")
    _save(fig, out_dir, "small_world_analysis.png", written)


def fig_graph_size_scaling(series, df, out_dir, written):
    """Node/edge growth per batch across epochs (reference :978)."""
    import matplotlib.pyplot as plt

    if not series:
        return
    fig, (ax1, ax2, ax3) = plt.subplots(1, 3, figsize=(12.5, 3.6))
    for ep, bm in sorted(series.items()):
        nodes = [b["network_metrics"].get("node_count") for b in bm]
        rels = [b["network_metrics"].get("relationship_count") for b in bm]
        xs = range(len(bm))
        ax1.plot(xs, nodes, alpha=0.8, label=f"ep{ep}")
        ax2.plot(xs, rels, alpha=0.8)
    ax1.set_xlabel("batch")
    ax1.set_ylabel("nodes")
    ax1.legend(fontsize=7)
    ax2.set_xlabel("batch")
    ax2.set_ylabel("relationships")
    if "node_count" in df.columns and df["node_count"].notna().any():
        ax3.scatter(df["node_count"], df["accuracy"], alpha=0.85)
        ax3.set_xlabel("final node count")
        ax3.set_ylabel("accuracy")
    fig.suptitle("Graph-size scaling")
    _save(fig, out_dir, "graph_size_scaling.png", written)


def fig_network_health_dashboard(df, series, out_dir, written):
    """Final-graph health dashboard (reference :1059)."""
    import matplotlib.pyplot as plt

    panels = [("density", "density"),
              ("clustering_coefficient", "clustering"),
              ("louvain_modularity", "modularity"),
              ("graph_robustness", "robustness"),
              ("weakly_connected_components", "components"),
              ("label_entropy", "label entropy")]
    avail = [(c, t) for c, t in panels
             if c in df.columns and df[c].notna().any()]
    if not avail:
        return
    fig, axes = plt.subplots(2, 3, figsize=(11.5, 6.2))
    for ax, (c, title) in zip(axes.ravel(), avail):
        ax.plot(df["epoch"], df[c], "o-")
        mu = df[c].mean()
        ax.axhline(mu, color="gray", linestyle=":",
                   label=f"mean {mu:.3f}")
        ax.set_xlabel("epoch")
        ax.set_title(title)
        ax.legend(fontsize=7)
    for ax in axes.ravel()[len(avail):]:
        ax.axis("off")
    fig.suptitle("Network-health dashboard (final graph per epoch)")
    _save(fig, out_dir, "network_health_dashboard.png", written)


def fig_epoch_progression(df, series, out_dir, written):
    import matplotlib.pyplot as plt

    if not series:
        return
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9.6, 3.6))
    for ep, bm in sorted(series.items()):
        times = [b.get("total_time") for b in bm]
        ax1.plot(range(len(bm)), times, alpha=0.8, label=f"ep{ep}")
        ent = [b["network_metrics"].get("label_entropy") for b in bm]
        ax2.plot(range(len(bm)), ent, alpha=0.8)
    ax1.set_xlabel("batch")
    ax1.set_ylabel("batch time (s)")
    ax1.legend(fontsize=7)
    ax2.set_xlabel("batch")
    ax2.set_ylabel("label entropy")
    fig.suptitle("Within-epoch progression")
    _save(fig, out_dir, "epoch_progression.png", written)


def fig_conference(df, optimal, importance, out_dir, written):
    """8-panel composite summary (reference :1112)."""
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 4, figsize=(15, 7))
    a = axes.ravel()
    # 1 accuracy per epoch
    a[0].plot(df["epoch"], df["accuracy"], "o-")
    a[0].set_title("accuracy / epoch")
    # 2 importance
    if importance:
        ks = list(importance)
        a[1].barh(ks, [importance[k] for k in ks])
        a[1].set_title("param importance")
    # 3 tradeoff
    if df["avg_retrieval_time"].notna().any():
        a[2].scatter(df["avg_retrieval_time"], df["accuracy"], alpha=0.8)
        a[2].set_title("accuracy vs latency")
    # 4 best-config text
    a[3].axis("off")
    best_lines = [f"{k} = {v}" for k, v in (optimal or {}).items()
                  if v is not None]
    a[3].text(0.02, 0.95, "best configuration:\n" + "\n".join(best_lines),
              va="top", fontsize=8, family="monospace")
    # 5 graph size vs accuracy
    if "node_count" in df.columns and df["node_count"].notna().any():
        a[4].scatter(df["node_count"], df["accuracy"], alpha=0.8)
        a[4].set_title("graph size vs accuracy")
    # 6 modularity vs accuracy
    if "louvain_modularity" in df.columns and \
            df["louvain_modularity"].notna().any():
        a[5].scatter(df["louvain_modularity"], df["accuracy"], alpha=0.8)
        a[5].set_title("modularity vs accuracy")
    # 7 top param effect
    cols = [c for c in PARAMS if c in df.columns and df[c].nunique() > 1]
    if cols:
        c = (sorted(cols, key=lambda c: -(importance or {}).get(c, 0.0))
             or cols)[0]
        named = _tercile_groups(df, c)
        a[6].bar([n for n, _ in named],
                 [g.mean() if len(g) else 0 for _, g in named])
        a[6].set_title(f"{c} effect")
    # 8 accuracy distribution
    a[7].hist(df["accuracy"], bins=min(10, max(4, len(df) // 2)),
              alpha=0.85, edgecolor="black")
    a[7].set_title("accuracy distribution")
    fig.suptitle("Parameter-sweep summary")
    _save(fig, out_dir, "conference_figure.png", written)


def make_figures(df, series, analysis, out_dir: Path) -> List[str]:
    import matplotlib
    matplotlib.use("Agg")

    written: List[str] = []
    fig_accuracy_per_epoch(df, out_dir, written)
    fig_accuracy_vs_params(df, out_dir, written)
    fig_correlation_heatmap(df, out_dir, written)
    fig_accuracy_vs_latency(df, out_dir, written)
    fig_metric_distributions(df, out_dir, written)
    fig_parameter_effects(df, out_dir, written)
    fig_pairwise_interactions(df, out_dir, written,
                              analysis.get("rf_importance"))
    fig_boxplots_by_parameter(df, out_dir, written)
    fig_build_time_analysis(df, out_dir, written)
    fig_network_topology_vs_accuracy(df, out_dir, written)
    fig_network_metrics_correlation(df, out_dir, written)
    fig_small_world_analysis(df, out_dir, written)
    fig_graph_size_scaling(series, df, out_dir, written)
    fig_network_health_dashboard(df, series, out_dir, written)
    fig_epoch_progression(df, series, out_dir, written)
    fig_conference(df, analysis.get("optimal_config"),
                   analysis.get("rf_importance"), out_dir, written)
    return written


# -------------------------------------------------------------------- report
def markdown_report(df, out_dir: Path, analysis: Dict[str, Any]) -> str:
    lines = ["# Parameter Sweep Analysis", "",
             f"Epochs analysed: {len(df)}", "",
             "## Best configuration", "```json",
             json.dumps(analysis["optimal_config"], indent=2), "```", "",
             "## Descriptive statistics (accuracy)", "```json",
             json.dumps(analysis["descriptive"].get("accuracy", {}),
                        indent=2), "```", ""]
    if analysis.get("rf_importance"):
        lines += ["## Random-forest permutation importance", "```json",
                  json.dumps(analysis["rf_importance"], indent=2),
                  "```", ""]
    if analysis.get("ols"):
        lines += ["## OLS regression (accuracy ~ params)", "```json",
                  json.dumps(analysis["ols"], indent=2), "```", ""]
    if analysis.get("anova"):
        lines += ["## One-way ANOVA (parameter terciles)", "```json",
                  json.dumps(analysis["anova"], indent=2), "```", ""]
    if analysis.get("tukey_hsd"):
        lines += ["## Tukey HSD post-hoc", "",
                  "| parameter | groups | mean diff | p (adj) | sig |",
                  "|---|---|---|---|---|"]
        for p, pairs in analysis["tukey_hsd"].items():
            for pr in pairs:
                lines.append(
                    f"| {p} | {pr['groups']} | {pr['mean_diff']} | "
                    f"{pr['p_adj']} | {'yes' if pr['significant'] else ''} |")
        lines.append("")
    lines += ["## Figures"] + [f"- {f}" for f in analysis["figures"]]
    path = out_dir / "sweep_analysis_report.md"
    path.write_text("\n".join(lines))
    return str(path)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--summary", default="sweep_results/sweep_summary.json")
    p.add_argument("--output-dir", default="sweep_results/analysis")
    args = p.parse_args()
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    df = load_frame(args.summary)
    if df.empty:
        print("No completed epochs to analyse")
        return
    df, series = load_network_metrics(df, Path(args.summary).parent)
    analysis = {
        "descriptive": descriptive_stats(df),
        "correlations": json.loads(correlations(df).to_json()),
        "rf_importance": rf_importance(df),
        "ols": ols_regression(df),
        "optimal_config": optimal_config(df),
        "anova": anova(df),
        "tukey_hsd": tukey_hsd_posthoc(df),
    }
    analysis["figures"] = make_figures(df, series, analysis, out_dir)
    (out_dir / "analysis.json").write_text(
        json.dumps(analysis, indent=2, default=str))
    report = markdown_report(df, out_dir, analysis)
    print(f"Analysis written to {out_dir} ({len(analysis['figures'])} "
          f"figures; report: {report})")


if __name__ == "__main__":
    main()
