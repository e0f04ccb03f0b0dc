"""Global LOGGER + persistent settings (parity: ref:ultralytics/utils/__init__.py:347,1173).

SettingsManager stores a JSON dict under ~/.config/xlstm_yolo_tpu/ with
atomic writes; no telemetry of any kind.
"""

from __future__ import annotations

import json
import logging
import os
from pathlib import Path

LOGGER = logging.getLogger("xlstm_yolo_tpu")
if not LOGGER.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(message)s"))
    LOGGER.addHandler(_h)
    LOGGER.setLevel(os.environ.get("XYT_LOG_LEVEL", "INFO"))


def colorstr(*args) -> str:
    """ANSI-colored prefix text ('blue', 'bold', text)."""
    *fmt, string = args if len(args) > 1 else ("blue", "bold", args[0])
    codes = {
        "black": 30, "red": 31, "green": 32, "yellow": 33, "blue": 34,
        "magenta": 35, "cyan": 36, "white": 37, "bold": 1, "underline": 4,
    }
    prefix = "".join(f"\033[{codes[c]}m" for c in fmt if c in codes)
    return f"{prefix}{string}\033[0m"


class SettingsManager(dict):
    """Persistent user settings JSON with versioned defaults."""

    def __init__(self, path: str | Path | None = None, version: str = "0.1.0"):
        self.path = Path(
            path or Path.home() / ".config" / "xlstm_yolo_tpu" / "settings.json"
        )
        self.version = version
        defaults = {
            "settings_version": version,
            "datasets_dir": str(Path.home() / "datasets"),
            "weights_dir": "weights",
            "runs_dir": "runs",
            "sync": False,  # no telemetry, ever
        }
        super().__init__(defaults)
        try:
            if self.path.exists():
                stored = json.loads(self.path.read_text())
                if stored.get("settings_version") == version:
                    self.update(stored)
        except Exception:
            pass

    def save(self):
        self.path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(json.dumps(dict(self), indent=2))
        tmp.replace(self.path)

    def update(self, *args, **kwargs):
        super().update(*args, **kwargs)

    def reset(self):
        # remove the stored file FIRST: __init__ re-reads it on a version
        # match, which used to silently undo the reset
        self.path.unlink(missing_ok=True)
        self.clear()
        self.__init__(self.path, self.version)
        self.save()


SETTINGS = SettingsManager()
