"""Rolling analytics (per-class counts over time) with chart export
(parity: ref:ultralytics/solutions/analytics.py)."""

from __future__ import annotations

from collections import Counter, deque

import numpy as np


class Analytics:
    def __init__(self, window: int = 100):
        self.window = window
        self.frames: deque[Counter] = deque(maxlen=window)

    def update(self, tracks: np.ndarray) -> Counter:
        t = np.asarray(tracks).reshape(-1, 7)
        c = Counter(int(r[6]) for r in t)
        self.frames.append(c)
        return c

    def totals(self) -> Counter:
        out: Counter = Counter()
        for c in self.frames:
            out.update(c)
        return out

    def plot(self, path: str, names: dict | None = None):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        totals = self.totals()
        labels = [str((names or {}).get(k, k)) for k in totals]
        plt.figure(figsize=(6, 3))
        plt.bar(labels, list(totals.values()))
        plt.ylabel(f"detections (last {len(self.frames)} frames)")
        plt.tight_layout()
        plt.savefig(path)
        plt.close()
