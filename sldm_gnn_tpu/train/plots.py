"""Training-curve plotting (reference: main.py:344-379 plotAccuracies)."""

from __future__ import annotations

from pathlib import Path

import numpy as np


def plot_accuracies(result, outfile: Path | str, *, label_num: int | None = None, params_text: str = ""):
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, (ax_plot, ax_text) = plt.subplots(
        1, 2, figsize=(10, 4), gridspec_kw={"width_ratios": [3, 2]}
    )
    ax_plot.plot(result.total_val_acc[0, :], color="blue", label="Val. Acc.")
    ax_plot.plot(result.total_train_acc[0, :], color="orange", linestyle="--", label="Tr. Acc.")
    if result.bin_cm is not None:
        tn, fp, fn, tp = (result.bin_cm[i, :] for i in range(4))
        precision = tp / (tp + fp + 1e-8)
        recall = tp / (tp + fn + 1e-8)
        ax_plot.plot(result.bin_rocauc[0, :], color="purple", label="Val. ROC AUC")
        ax_plot.plot(precision, color="green", alpha=0.2, label="Val. Precision")
        ax_plot.plot(recall, color="red", alpha=0.2, label="Val. Recall")
    ax_plot.set_ylim(bottom=0, top=1)
    ax_plot.set_yticks(np.arange(-0.1, 1.2, 0.1))
    ax_plot.grid(True)
    ax_plot.legend()
    title = f"Validation Accuracy" + (f" for label #{label_num}" if label_num is not None else "")
    ax_plot.set_title(title)

    best_idx = int(result.total_val_acc[0, :].argmax())
    text = params_text + f"\nBest Val. Acc.: {result.total_val_acc[0, best_idx]:.4f} @ep.{best_idx}\n"
    if result.bin_rocauc is not None:
        bi = int(result.bin_rocauc[0, :].argmax())
        text += f"Best Val. ROC AUC: {result.bin_rocauc[0, bi]:.4f} @ep.{bi}\n"
    ax_text.axis("off")
    ax_text.text(0, 0.95, text, va="top", fontsize=7)

    fig.tight_layout()
    plt.savefig(outfile)
    plt.close(fig)
