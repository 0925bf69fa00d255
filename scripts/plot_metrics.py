"""Plot the per-iter training series from a run's metrics.jsonl
(written by System.fit) plus the per-validation metrics.txt.

    python scripts/plot_metrics.py runs/<name> [out.png]
"""

import json
import os
import sys


def load_jsonl(path):
    rows = []
    if os.path.isfile(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
    return rows


def main():
    run_dir = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        run_dir, "metrics.png")
    train = load_jsonl(os.path.join(run_dir, "metrics.jsonl"))
    val = load_jsonl(os.path.join(run_dir, "metrics.txt"))
    if not train and not val:
        raise SystemExit(f"no metrics found under {run_dir}")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    if train:
        its = [r["it"] for r in train]
        axes[0].plot(its, [r["loss"] for r in train], label="loss")
        axes[0].set_yscale("log")
        axes[0].set_xlabel("iteration")
        axes[0].set_title("train loss")
        axes[1].plot(its, [r["psnr"] for r in train], label="train psnr")
    if val:
        its = [r["it"] for r in val]
        axes[1].plot(its, [r["psnr"] for r in val], "o-", label="val psnr")
        if any("lpips" in r for r in val):
            ax2 = axes[1].twinx()
            ax2.plot(its, [r.get("lpips") for r in val], "s--", color="C3",
                     label="val lpips")
            ax2.set_ylabel("lpips")
    axes[1].set_xlabel("iteration")
    axes[1].set_title("psnr")
    axes[1].legend()
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print("wrote", out)


if __name__ == "__main__":
    main()
