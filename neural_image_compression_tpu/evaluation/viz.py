"""Training-evolution plots (capability parity with utils.py:12-72).

Same plots, headless: figures are returned and optionally saved, never
plt.show()n.
"""

from typing import List, Optional, Tuple


def plot_information_evolution(H_y: List[Tuple[int, float]],
                               H_y1: List[Tuple[int, float]],
                               save_path: Optional[str] = None):
    """Total latent rate and vision-task information ratio over training
    (utils.py:12-52). H_y / H_y1: [(step, bpp)] for total and base latents."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    steps, total_bpp = zip(*H_y)
    _, base_bpp = zip(*H_y1)
    vision_info = [b / t * 100 if t > 0 else 0 for b, t in zip(base_bpp, total_bpp)]

    fig, ax1 = plt.subplots(figsize=(8, 5))
    color = "tab:blue"
    ax1.set_xlabel("Training Steps")
    ax1.set_ylabel("Total Latent Information (bpp)", color=color)
    ax1.plot(steps, total_bpp, color=color, label="Total Latent Information",
             linewidth=0.5)
    ax1.tick_params(axis="y", labelcolor=color)

    ax2 = ax1.twinx()
    color = "tab:red"
    ax2.set_ylabel("Vision Task Information (%)", color=color)
    ax2.plot(steps, vision_info, color=color, linestyle="--",
             label="Vision Task Information (%)", linewidth=0.5)
    ax2.tick_params(axis="y", labelcolor=color)

    plt.title("Evolution of Vision Task Information and Total Rate Through Training")
    fig.tight_layout()
    lines, labels = ax1.get_legend_handles_labels()
    lines2, labels2 = ax2.get_legend_handles_labels()
    ax1.legend(lines + lines2, labels + labels2, loc="best")
    if save_path:
        fig.savefig(save_path, dpi=100)
        plt.close(fig)
        return save_path
    return fig


def plot_metric_evolution(metric_list: List[Tuple[int, float]],
                          y_label: str = "Metric",
                          save_path: Optional[str] = None):
    """Single-metric evolution plot (utils.py:55-72)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    steps, values = zip(*metric_list)
    fig = plt.figure(figsize=(8, 5))
    plt.plot(steps, values, color="tab:blue", linewidth=0.5)
    plt.xlabel("Training Steps")
    plt.ylabel(y_label)
    plt.title(f"Evolution of {y_label} Through Training")
    plt.grid(True, linestyle="--", alpha=0.6)
    plt.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=100)
        plt.close(fig)
        return save_path
    return fig
