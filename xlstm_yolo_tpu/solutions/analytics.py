"""Rolling analytics with chart export
(parity: ref:ultralytics/solutions/analytics.py).

The reference renders a live matplotlib chart per frame — line (total
counts over frames), multiline/area (per-class over frames), bar and
pie (current-frame class distribution) — and returns it as an image
(ref:analytics.py:60-247 process_data/update_graph).  This class keeps
the same chart types but exposes them as ``chart(kind)`` -> BGR ndarray
plus ``plot(path)`` for file export; ``process_data(im0, frame_number)``
runs track->update->chart like the reference.
"""

from __future__ import annotations

from collections import Counter, deque

import numpy as np

from xlstm_yolo_tpu.solutions.base import BaseSolution


class Analytics(BaseSolution):
    def __init__(self, window: int = 100, kind: str = "line", **kwargs):
        super().__init__(**kwargs)
        self.window = window
        self.kind = kind
        self.frames: deque[Counter] = deque(maxlen=window)
        self.frame_numbers: deque[int] = deque(maxlen=window)

    def update(self, tracks: np.ndarray, frame_number: int | None = None) -> Counter:
        t = np.asarray(tracks).reshape(-1, 7)
        c = Counter(int(r[6]) for r in t)
        self.frames.append(c)
        self.frame_numbers.append(
            frame_number if frame_number is not None else len(self.frame_numbers))
        return c

    def totals(self) -> Counter:
        out: Counter = Counter()
        for c in self.frames:
            out.update(c)
        return out

    def _classes(self) -> list[int]:
        return sorted(self.totals())

    def _label(self, k: int) -> str:
        return str(self.names.get(k, k))

    def _fig(self, kind: str):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6.4, 3.6), dpi=100)
        xs = list(self.frame_numbers)
        if kind == "line":
            ax.plot(xs, [sum(c.values()) for c in self.frames], marker="o")
            ax.set_ylabel("total counts")
            ax.set_xlabel("frame")
        elif kind in ("multiline", "area"):
            series = {k: [c.get(k, 0) for c in self.frames] for k in self._classes()}
            if kind == "area" and series:
                ax.stackplot(xs, series.values(),
                             labels=[self._label(k) for k in series])
            else:
                for k, ys in series.items():
                    ax.plot(xs, ys, label=self._label(k), marker=".")
            if series:
                ax.legend(fontsize=7)
            ax.set_ylabel("counts")
            ax.set_xlabel("frame")
        elif kind == "bar":
            cur = self.frames[-1] if self.frames else Counter()
            ax.bar([self._label(k) for k in cur], list(cur.values()))
            ax.set_ylabel("counts (current frame)")
        elif kind == "pie":
            cur = self.frames[-1] if self.frames else Counter()
            if cur:
                ax.pie(list(cur.values()),
                       labels=[self._label(k) for k in cur], autopct="%1.0f%%")
        else:
            raise ValueError(f"unknown chart kind {kind!r}")
        fig.tight_layout()
        return fig

    def chart(self, kind: str | None = None) -> np.ndarray:
        """Render the chart to a BGR image (the reference's per-frame
        canvas-to-image path)."""
        fig = self._fig(kind or self.kind)
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        import matplotlib.pyplot as plt

        plt.close(fig)
        return buf[..., ::-1].copy()  # RGB -> BGR

    def plot(self, path: str, kind: str | None = None, names: dict | None = None):
        if names:
            self.names = {**self.names, **names}
        fig = self._fig(kind or ("bar" if kind is None and not self.frame_numbers else self.kind))
        fig.savefig(path)
        import matplotlib.pyplot as plt

        plt.close(fig)

    def process_data(self, im0: np.ndarray, frame_number: int) -> np.ndarray:
        """Track the frame, update series, return the chart image."""
        self.update(self.extract_tracks(im0), frame_number)
        return self.chart()
