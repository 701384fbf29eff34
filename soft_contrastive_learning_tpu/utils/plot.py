"""Plot helpers (reference util/plot.py)."""

from __future__ import annotations

from typing import Dict


def dict_to_bar(data: Dict[str, float], out_file: str) -> None:
    """Bar chart of a dict saved to a file (reference util/plot.py:4-14)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(7, 7))
    names = list(data.keys())
    values = list(data.values())
    plt.bar(range(len(data)), values, tick_label=names)
    plt.xticks(rotation=45)
    plt.savefig(out_file)
    plt.close(fig)
