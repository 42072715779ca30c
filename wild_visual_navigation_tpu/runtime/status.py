"""Status monitoring thread.

Equivalent of the reference feature-extractor node's status thread
(wvn_feature_extractor_node.py:238-271): a periodic table of input
freshness (last message age per topic/camera) with staleness coloring,
printed or retrievable as rows for a UI.
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Dict, List, Optional


class StatusMonitor:
    def __init__(self, rate_hz: float = 0.5, stale_after: float = 1.0, printer: Optional[Callable] = print):
        self._rate = rate_hz
        self._stale_after = stale_after
        self._printer = printer
        self._last_seen: Dict[str, float] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def tick(self, name: str, stamp: Optional[float] = None):
        """Record activity on a monitored input."""
        with self._lock:
            self._last_seen[name] = stamp if stamp is not None else time.time()

    def rows(self, now: Optional[float] = None) -> List[dict]:
        now = now if now is not None else time.time()
        with self._lock:
            items = sorted(self._last_seen.items())
        out = []
        for name, t in items:
            age = now - t
            state = "ok" if age < self._stale_after else ("stale" if age < 5 * self._stale_after else "dead")
            out.append({"input": name, "age_s": round(age, 3), "state": state})
        return out

    def render(self, now: Optional[float] = None) -> str:
        rows = self.rows(now)
        if not rows:
            return "(no inputs seen yet)"
        w = max(len(r["input"]) for r in rows)
        lines = [f"{'input'.ljust(w)}  age_s   state"]
        for r in rows:
            lines.append(f"{r['input'].ljust(w)}  {r['age_s']:<6} {r['state']}")
        return "\n".join(lines)

    def start(self):
        def loop():
            period = 1.0 / self._rate
            while not self._stop.is_set():
                if self._printer is not None:
                    self._printer(self.render())
                self._stop.wait(period)

        self._stop.clear()
        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
            self._thread = None
