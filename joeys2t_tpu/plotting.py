# coding: utf-8
"""
Attention visualization (counterpart of joeynmt/plotting.py:18-87).
"""
from typing import List, Optional

import numpy as np

from joeys2t_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def plot_heatmap(
    scores: np.ndarray,
    column_labels: List[str],
    row_labels: List[str],
    output_path: Optional[str] = None,
    dpi: int = 300,
):
    """Plot a (src x trg) attention heatmap to png/pdf or return the figure."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.backends.backend_pdf import PdfPages

    x_sc, y_sc = 0.5, 0.8
    font_size = 8

    fig, ax = plt.subplots(figsize=(x_sc * len(column_labels), y_sc * len(row_labels)))
    plt.imshow(scores, cmap="viridis", aspect="auto", origin="upper",
               vmin=0.0, vmax=1.0)
    ax.xaxis.tick_top()
    ax.set_xticks(np.arange(scores.shape[1]) + 0, minor=False)
    ax.set_yticks(np.arange(scores.shape[0]) + 0, minor=False)
    ax.set_xticklabels(column_labels, minor=False, rotation="vertical",
                       fontsize=font_size)
    ax.set_yticklabels(row_labels, minor=False, fontsize=font_size)
    plt.tight_layout()

    if output_path is not None:
        if output_path.endswith(".pdf"):
            pp = PdfPages(output_path)
            pp.savefig(fig)
            pp.close()
        else:
            if not output_path.endswith(".png"):
                output_path += ".png"
            plt.savefig(output_path)
        plt.close(fig)
    return fig


def store_attention_plots(
    attentions,
    targets: List[List[str]],
    sources: List[List[str]],
    output_prefix: str,
    indices: List[int],
    tb_writer=None,
    steps: int = 0,
) -> None:
    """Save attention plots for selected examples (joeynmt/helpers.py:154-207)."""
    for i in indices:
        if i >= len(sources):
            continue
        plot_file = f"{output_prefix}.{i}.png"
        src = sources[i]
        trg = targets[i]
        attention_scores = np.asarray(attentions[i]).T
        # decode buffers are padded to static shapes (bucketed src frames /
        # max decode steps); trim to the labeled lengths before plotting
        attention_scores = attention_scores[:len(src), :len(trg)]
        try:
            plot_heatmap(scores=attention_scores, column_labels=trg,
                         row_labels=src, output_path=plot_file, dpi=100)
            if tb_writer is not None:
                fig = plot_heatmap(scores=attention_scores, column_labels=trg,
                                   row_labels=src, output_path=None, dpi=50)
                tb_writer.add_figure(f"attention/{i}.", fig, global_step=steps)
        except Exception:  # pragma: no cover
            logger.warning("Couldn't plot example %d: src len %d, trg len %d, "
                           "attention scores shape %s", i, len(src), len(trg),
                           attention_scores.shape)
            continue


def plot_learning_curve(validations_file: str, output_path: str,
                        metrics: Optional[List[str]] = None) -> None:
    """Learning curves from validations.txt (scripts/plot_validations.py)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = []
    with open(validations_file, "r", encoding="utf-8") as f:
        for line in f:
            entry = {}
            for part in line.strip().split("\t"):
                if ":" in part:
                    k, v = part.split(":", 1)
                    try:
                        entry[k.strip().lower()] = float(v.strip())
                    except ValueError:
                        pass
            if entry:
                rows.append(entry)
    if not rows:
        logger.warning("No validation entries found in %s", validations_file)
        return
    metrics = metrics or [k for k in rows[0] if k not in ("steps", "lr")]
    steps = [r.get("steps", i) for i, r in enumerate(rows)]
    fig, axes = plt.subplots(len(metrics), 1, figsize=(8, 3 * len(metrics)),
                             squeeze=False)
    for ax, metric in zip(axes[:, 0], metrics):
        ax.plot(steps, [r.get(metric, float("nan")) for r in rows], marker="o")
        ax.set_xlabel("steps")
        ax.set_ylabel(metric)
    plt.tight_layout()
    plt.savefig(output_path)
    plt.close(fig)
