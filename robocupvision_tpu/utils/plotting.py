"""Training-curve logging — the Visdom LinePlotter's replacement.

The reference streams loss curves to a Visdom server (visualize.py:4-21).
Here ``LinePlotter`` keeps the same ``plot(var, split, x, y)`` call surface
but appends to TSV files (always) and renders PNG charts (when matplotlib is
available) — no server, artifacts live next to the checkpoints.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, List, Tuple


class LinePlotter:
    def __init__(self, env_name: str = "main", out_dir: str = "plots"):
        self.env = env_name
        self.out_dir = out_dir
        self.series: Dict[str, Dict[str, List[Tuple[float, float]]]] = \
            defaultdict(lambda: defaultdict(list))
        os.makedirs(out_dir, exist_ok=True)

    def plot(self, var_name: str, split_name: str, x: float, y: float) -> None:
        self.series[var_name][split_name].append((float(x), float(y)))
        path = os.path.join(self.out_dir, f"{self.env}_{var_name}.tsv")
        write_header = not os.path.exists(path)
        with open(path, "a") as f:
            if write_header:
                f.write("split\tx\ty\n")
            f.write(f"{split_name}\t{x}\t{y}\n")

    def render(self) -> List[str]:
        """Write one PNG per variable; returns the file paths."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:  # pragma: no cover
            return []
        out = []
        for var, splits in self.series.items():
            fig, ax = plt.subplots(figsize=(6, 4))
            for split, pts in splits.items():
                xs, ys = zip(*pts)
                ax.plot(xs, ys, label=split)
            ax.set_title(var)
            ax.set_xlabel("Iters")
            ax.set_ylabel(var)
            ax.legend()
            path = os.path.join(self.out_dir, f"{self.env}_{var}.png")
            fig.savefig(path, dpi=100, bbox_inches="tight")
            plt.close(fig)
            out.append(path)
        return out
