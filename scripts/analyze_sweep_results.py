#!/usr/bin/env python3
"""Lightweight sweep analysis (numpy/matplotlib only).

Compact equivalent of reference scripts/analyze_sweep_results.py:38-295:
loads per-epoch summaries, prints basic statistics and per-parameter
correlations, renders three plots, writes a short markdown report.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Dict, List

import numpy as np

PARAMS = ["chunk_size", "chunk_overlap", "max_triplets_per_chunk",
          "global_triplet_limit", "max_new_triplets"]


def load_epochs(path: str) -> List[Dict]:
    data = json.loads(Path(path).read_text())
    epochs = data.get("epochs", data if isinstance(data, list) else [])
    return [e for e in epochs if e.get("accuracy") is not None]


def basic_stats(epochs: List[Dict]) -> Dict:
    acc = np.asarray([e["accuracy"] for e in epochs], float)
    return {"n": len(acc), "mean": float(acc.mean()),
            "std": float(acc.std()), "min": float(acc.min()),
            "max": float(acc.max())}


def param_correlations(epochs: List[Dict]) -> Dict[str, float]:
    acc = np.asarray([e["accuracy"] for e in epochs], float)
    out = {}
    for p in PARAMS:
        vals = np.asarray([e.get("params", {}).get(p, np.nan)
                           for e in epochs], float)
        ok = ~np.isnan(vals)
        if ok.sum() > 2 and np.std(vals[ok]) > 0 and np.std(acc[ok]) > 0:
            out[p] = float(np.corrcoef(vals[ok], acc[ok])[0, 1])
    return out


def plots(epochs: List[Dict], out_dir: Path) -> List[str]:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    written = []
    acc = [e["accuracy"] for e in epochs]
    idx = [e["epoch"] for e in epochs]

    fig, ax = plt.subplots(figsize=(7, 3.5))
    ax.plot(idx, acc, "o-")
    ax.set_xlabel("epoch")
    ax.set_ylabel("accuracy")
    fig.tight_layout()
    p = out_dir / "light_accuracy.png"
    fig.savefig(p, dpi=110)
    plt.close(fig)
    written.append(str(p))

    fig, ax = plt.subplots(figsize=(5, 3.5))
    ax.hist(acc, bins=min(10, max(3, len(acc) // 2)))
    ax.set_xlabel("accuracy")
    ax.set_ylabel("count")
    fig.tight_layout()
    p = out_dir / "light_accuracy_hist.png"
    fig.savefig(p, dpi=110)
    plt.close(fig)
    written.append(str(p))

    corr = param_correlations(epochs)
    if corr:
        fig, ax = plt.subplots(figsize=(6, 3.5))
        ax.bar(list(corr), list(corr.values()))
        ax.set_ylabel("corr(param, accuracy)")
        ax.axhline(0, color="k", lw=0.5)
        plt.xticks(rotation=30, ha="right")
        fig.tight_layout()
        p = out_dir / "light_param_correlations.png"
        fig.savefig(p, dpi=110)
        plt.close(fig)
        written.append(str(p))
    return written


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--summary", default="sweep_results/sweep_summary.json")
    ap.add_argument("--output-dir", default="sweep_results/light_analysis")
    args = ap.parse_args()
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    epochs = load_epochs(args.summary)
    if not epochs:
        print("No completed epochs found")
        return
    stats = basic_stats(epochs)
    corr = param_correlations(epochs)
    figs = plots(epochs, out_dir)
    report = out_dir / "light_report.md"
    report.write_text("\n".join([
        "# Sweep results (light analysis)", "",
        "## Accuracy statistics", "```json",
        json.dumps(stats, indent=2), "```", "",
        "## Parameter correlations", "```json",
        json.dumps(corr, indent=2), "```", "",
        "## Figures"] + [f"- {f}" for f in figs]))
    print(json.dumps({"stats": stats, "correlations": corr,
                      "report": str(report)}, indent=2))


if __name__ == "__main__":
    main()
