#!/usr/bin/env python3
"""YAML-driven multi-run metric comparison plots.

Parity with reference scripts/plot/plot_metrics.py:42-123: the YAML config
(config/plot_metrics.yaml) lists per-batch network-metrics JSON files (as
written by the KG builder: metrics/{uuid}_batch_metrics_kg.json) and a set
of metric toggles; one subplot per enabled metric, one curve per run, with
the average batch total_time in the footer.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Any, Dict, List

import yaml


def load_run(path: str) -> List[Dict[str, Any]]:
    return json.loads(Path(path).read_text())


def make_plots(config_path: str, output_path: str = "metrics_plot.png"
               ) -> str:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    runs = cfg.get("runs", [])
    metric_toggles: Dict[str, bool] = cfg.get("metrics", {})
    enabled = [m for m, on in metric_toggles.items() if on]
    if not runs or not enabled:
        raise ValueError("plot config needs non-empty 'runs' and 'metrics'")

    ncols = min(3, len(enabled))
    nrows = -(-len(enabled) // ncols)
    fig, axes = plt.subplots(nrows, ncols,
                             figsize=(4.5 * ncols, 3.2 * nrows),
                             squeeze=False)
    footer_parts = []
    for run in runs:
        label = run.get("label", Path(run["path"]).stem)
        entries = load_run(run["path"])
        batches = [e["batch_idx"] for e in entries]
        times = [e.get("total_time", 0.0) for e in entries]
        if times:
            footer_parts.append(
                f"{label}: avg total_time {sum(times)/len(times):.2f}s")
        for i, metric in enumerate(enabled):
            ax = axes[i // ncols][i % ncols]
            vals = [e.get("network_metrics", {}).get(metric)
                    for e in entries]
            pts = [(b, v) for b, v in zip(batches, vals) if v is not None]
            if pts:
                ax.plot(*zip(*pts), marker=".", label=label)
            ax.set_title(metric)
            ax.set_xlabel("batch")
    for i in range(len(enabled)):
        axes[i // ncols][i % ncols].legend(fontsize=7)
    for j in range(len(enabled), nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    if footer_parts:
        fig.text(0.5, 0.005, " | ".join(footer_parts), ha="center",
                 fontsize=8)
    fig.tight_layout(rect=(0, 0.02, 1, 1))
    fig.savefig(output_path, dpi=120)
    plt.close(fig)
    print(f"Wrote {output_path}")
    return output_path


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="config/plot_metrics.yaml")
    ap.add_argument("--output", default="metrics_plot.png")
    a = ap.parse_args()
    make_plots(a.config, a.output)
