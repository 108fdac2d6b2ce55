"""Plot learning curves from metrics JSONL files -> docs PNG.

Usage:
    python tools/plot_curves.py out.png label1=path1.jsonl [label2=path2.jsonl ...]

Each input line is a dict with at least {"samples": int}; curves are drawn
for the metric keys below, one panel per metric (no dual axes).
"""

import json
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

# categorical slots (dataviz reference palette, fixed order)
COLORS = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4", "#008300"]

PANELS = [
    ("mean_reward", "mean training reward / step"),
    ("mean_ep_len", "mean episode length (steps)"),
    ("fail_frac", "failure fraction / step"),
    ("test_mean_ep_len", "greedy eval episode length"),
]


def load(path):
    rows = [json.loads(l) for l in open(path) if l.strip()]
    # drop the first ~2M samples: episode-length/fail stats are undefined
    # before the first terminations (1/done_frac spikes)
    return [r for r in rows if r.get("samples", 0) > 2_000_000]


def smooth(x, k=9):
    if len(x) < k:
        return np.asarray(x)
    w = np.ones(k) / k
    return np.convolve(x, w, mode="valid")


def main():
    out = sys.argv[1]
    series = [a.split("=", 1) for a in sys.argv[2:]]
    data = {label: load(path) for label, path in series}

    panels = [
        (key, title) for key, title in PANELS
        if any(key in r for rows in data.values() for r in rows)
    ]
    fig, axes = plt.subplots(
        1, len(panels), figsize=(5.2 * len(panels), 3.6), squeeze=False
    )
    for ax, (key, title) in zip(axes[0], panels):
        for ci, (label, rows) in enumerate(data.items()):
            pts = [(r["samples"], r[key]) for r in rows if key in r]
            if not pts:
                continue
            s = np.asarray([p[0] for p in pts]) / 1e6
            v = smooth([p[1] for p in pts])
            s = s[len(s) - len(v):]
            ax.plot(s, v, color=COLORS[ci % len(COLORS)], linewidth=2,
                    label=label)
        ax.set_title(title, fontsize=10)
        ax.set_xlabel("samples (M)", fontsize=9)
        ax.grid(color="#e3e5e9", linewidth=0.6)
        for spine in ("top", "right"):
            ax.spines[spine].set_visible(False)
        ax.tick_params(labelsize=8, color="#c6c9cf")
    if len(data) > 1:
        axes[0][0].legend(frameon=False, fontsize=9)
    fig.tight_layout()
    fig.savefig(out, dpi=140)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
