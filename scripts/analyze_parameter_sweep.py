#!/usr/bin/env python3
"""Statistical analysis + figures for a parameter sweep.

Compact equivalent of reference scripts/analyze_parameter_sweep.py
(descriptive statistics, parameter/metric correlations, random-forest
permutation importance, OLS regression, optimal-configuration search,
one-way ANOVA across parameter bins, figure suite, markdown report) driven
by ``sweep_summary.json`` from scripts/run_parameter_sweep.py.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

PARAMS = ["chunk_size", "chunk_overlap", "max_triplets_per_chunk",
          "global_triplet_limit", "max_new_triplets"]
METRICS = ["accuracy", "avg_retrieval_time"]


def load_frame(summary_path: str):
    import pandas as pd

    data = json.loads(Path(summary_path).read_text())
    rows = []
    for e in data.get("epochs", []):
        if e.get("accuracy") is None:
            continue
        row = {"epoch": e["epoch"], **e.get("params", {}),
               "accuracy": e["accuracy"],
               "avg_retrieval_time": e.get("avg_retrieval_time")}
        rows.append(row)
    return pd.DataFrame(rows)


def descriptive_stats(df) -> Dict[str, Any]:
    return json.loads(df.describe().to_json())


def correlations(df):
    cols = [c for c in PARAMS + METRICS if c in df.columns]
    return df[cols].corr(method="spearman")


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
    try:
        import statsmodels.api as sm
    except ImportError:
        return None
    cols = [c for c in PARAMS if c in df.columns]
    if len(df) <= len(cols) + 1:
        return None
    X = sm.add_constant(df[cols].astype(float))
    model = sm.OLS(df["accuracy"].astype(float), X).fit()
    return {"r_squared": round(model.rsquared, 4),
            "params": {k: round(v, 6)
                       for k, v in model.params.to_dict().items()},
            "pvalues": {k: round(v, 4)
                        for k, v in model.pvalues.to_dict().items()}}


def optimal_config(df) -> Dict[str, Any]:
    best = df.loc[df["accuracy"].idxmax()]
    return {k: (float(best[k]) if k in best else None)
            for k in PARAMS + METRICS + ["epoch"]}


def anova(df) -> Dict[str, Any]:
    """One-way ANOVA of accuracy across two bins (median split) per param."""
    try:
        from scipy import stats
    except ImportError:
        return {}
    out = {}
    for p in PARAMS:
        if p not in df.columns or df[p].nunique() < 2:
            continue
        med = df[p].median()
        lo = df[df[p] <= med]["accuracy"]
        hi = df[df[p] > med]["accuracy"]
        if len(lo) > 1 and len(hi) > 1:
            f, pv = stats.f_oneway(lo, hi)
            out[p] = {"f": round(float(f), 4), "p": round(float(pv), 4)}
    return out


def make_figures(df, out_dir: Path) -> List[str]:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    written = []
    # accuracy over epochs
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(df["epoch"], df["accuracy"], "o-")
    ax.set_xlabel("epoch")
    ax.set_ylabel("accuracy")
    ax.set_title("Benchmark accuracy per sweep epoch")
    fig.tight_layout()
    p = out_dir / "accuracy_per_epoch.png"
    fig.savefig(p, dpi=120)
    plt.close(fig)
    written.append(str(p))

    # scatter per parameter
    cols = [c for c in PARAMS if c in df.columns]
    if cols:
        fig, axes = plt.subplots(1, len(cols),
                                 figsize=(3.2 * len(cols), 3.2))
        axes = np.atleast_1d(axes)
        for ax, c in zip(axes, cols):
            ax.scatter(df[c], df["accuracy"], alpha=0.7)
            ax.set_xlabel(c)
            ax.set_ylabel("accuracy")
        fig.tight_layout()
        p = out_dir / "accuracy_vs_params.png"
        fig.savefig(p, dpi=120)
        plt.close(fig)
        written.append(str(p))

    # correlation heatmap
    corr = correlations(df)
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(corr.values, cmap="coolwarm", vmin=-1, vmax=1)
    ax.set_xticks(range(len(corr.columns)))
    ax.set_xticklabels(corr.columns, rotation=45, ha="right")
    ax.set_yticks(range(len(corr.columns)))
    ax.set_yticklabels(corr.columns)
    fig.colorbar(im)
    ax.set_title("Spearman correlations")
    fig.tight_layout()
    p = out_dir / "correlation_heatmap.png"
    fig.savefig(p, dpi=120)
    plt.close(fig)
    written.append(str(p))

    # accuracy vs retrieval-latency tradeoff
    if df["avg_retrieval_time"].notna().any():
        fig, ax = plt.subplots(figsize=(5, 4))
        ax.scatter(df["avg_retrieval_time"], df["accuracy"], alpha=0.7)
        ax.set_xlabel("avg retrieval time (s)")
        ax.set_ylabel("accuracy")
        ax.set_title("Accuracy vs retrieval latency")
        fig.tight_layout()
        p = out_dir / "accuracy_vs_latency.png"
        fig.savefig(p, dpi=120)
        plt.close(fig)
        written.append(str(p))
    return written


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
        lines += ["## One-way ANOVA (median split per parameter)", "```json",
                  json.dumps(analysis["anova"], indent=2), "```", ""]
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
    analysis = {
        "descriptive": descriptive_stats(df),
        "correlations": json.loads(correlations(df).to_json()),
        "rf_importance": rf_importance(df),
        "ols": ols_regression(df),
        "optimal_config": optimal_config(df),
        "anova": anova(df),
    }
    analysis["figures"] = make_figures(df, out_dir)
    (out_dir / "analysis.json").write_text(
        json.dumps(analysis, indent=2, default=str))
    report = markdown_report(df, out_dir, analysis)
    print(f"Analysis written to {out_dir} (report: {report})")


if __name__ == "__main__":
    main()
