"""Render the convergence-evidence curves (docs/) from training artifacts.

  python tools/plot_convergence.py nerf <model_path> [out.png]
      reads <model_path>/metrics.jsonl -> loss + PSNR curves
  python tools/plot_convergence.py grasp <model_path> [out.png]
      reads <model_path>/valid/results-*.pkl -> mean/best oracle errors

Chart rules (dataviz skill): one axis per panel (never dual-axis), thin
2px lines, recessive grid, neutral ink for text, categorical hues in fixed
order (blue #2a78d6, orange #eb6834), legend only when >= 2 series.
"""

import glob
import json
import os
import pickle
import re
import sys

# the grasp results pickles reference tcnerf classes; make the repo root
# importable regardless of where the tool is launched from
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

BLUE, ORANGE = "#2a78d6", "#eb6834"
INK, MUTED = "#0b0b0b", "#52514e"


def _style(ax, title, xlabel, ylabel):
    ax.set_title(title, color=INK, fontsize=11, loc="left")
    ax.set_xlabel(xlabel, color=MUTED, fontsize=9)
    ax.set_ylabel(ylabel, color=MUTED, fontsize=9)
    ax.grid(True, color="#e6e5e1", linewidth=0.6)
    ax.tick_params(colors=MUTED, labelsize=8)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color("#c3c2b7")


def plot_nerf(model_path: str, out: str):
    rows = [json.loads(l) for l in open(os.path.join(model_path,
                                                     "metrics.jsonl"))]
    # a resumed run re-logs its first eval round; keep the last row per epoch
    rows = list({r["epoch"]: r for r in rows}.values())
    rows.sort(key=lambda r: r["epoch"])
    ep = [r["epoch"] for r in rows if r.get("psnr_db") is not None]
    ps = [r["psnr_db"] for r in rows if r.get("psnr_db") is not None]
    le = [r["epoch"] for r in rows if r.get("loss") is not None]
    lo = [r["loss"] for r in rows if r.get("loss") is not None]

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 3.2), dpi=140,
                                   facecolor="#fcfcfb")
    for ax in (ax1, ax2):
        ax.set_facecolor("#fcfcfb")
    ax1.plot(le, lo, color=BLUE, linewidth=2)
    ax1.set_yscale("log")
    _style(ax1, "Training loss (MSE coarse+fine)", "epoch", "loss")
    ax2.plot(ep, ps, color=BLUE, linewidth=2)
    _style(ax2, "Validation PSNR", "epoch", "dB")
    if ps:
        ax2.annotate(f"{ps[-1]:.1f} dB", (ep[-1], ps[-1]), color=INK,
                     fontsize=9, xytext=(-6, 6), textcoords="offset points",
                     ha="right")
    fig.tight_layout()
    fig.savefig(out)
    print(f"{out}: final PSNR {ps[-1]:.2f} dB over {ep[-1]} epochs"
          if ps else f"{out}: no PSNR rows")


def plot_grasp(model_path: str, out: str):
    files = glob.glob(os.path.join(model_path, "valid", "results-*.pkl"))
    files.sort(key=lambda p: int(re.search(r"results-(\d+)", p).group(1)))
    epochs, mean_t, mean_r, best_t, best_r = [], [], [], [], []
    for p in files:
        with open(p, "rb") as f:
            results = pickle.load(f)
        errs = [r["errors_r"] for r in results]
        mean = np.mean(np.concatenate(errs, axis=0), axis=0)
        best = np.mean(np.stack([e[-1] for e in errs], axis=0), axis=0)
        epochs.append(int(re.search(r"results-(\d+)", p).group(1)))
        mean_t.append(mean[0] * 1000)
        mean_r.append(np.degrees(mean[1]))
        best_t.append(best[0] * 1000)
        best_r.append(np.degrees(best[1]))

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 3.2), dpi=140,
                                   facecolor="#fcfcfb")
    for ax, m, b, title, unit in (
            (ax1, mean_t, best_t, "Translational oracle error", "mm"),
            (ax2, mean_r, best_r, "Rotational oracle error", "deg")):
        ax.set_facecolor("#fcfcfb")
        ax.plot(epochs, m, color=BLUE, linewidth=2, label="mean of top-5")
        ax.plot(epochs, b, color=ORANGE, linewidth=2, label="best")
        _style(ax, title, "epoch", unit)
        ax.legend(frameon=False, fontsize=8, labelcolor=MUTED)
    fig.tight_layout()
    fig.savefig(out)
    if epochs:
        print(f"{out}: best errors at epoch {epochs[-1]}: "
              f"{best_t[-1]:.1f} mm / {best_r[-1]:.1f} deg")


if __name__ == "__main__":
    kind, model_path = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else f"docs/convergence_{kind}.png"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    (plot_nerf if kind == "nerf" else plot_grasp)(model_path, out)
