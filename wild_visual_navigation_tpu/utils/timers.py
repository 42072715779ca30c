"""Timing / tracing utilities.

Replacement for the reference's pervasive `pytictac` usage
(SURVEY.md §5: @accumulate_time on estimator methods, ClassTimer
aggregation, inline Timer context managers). Same surface:

  * `Timer` — context manager printing elapsed time;
  * `ClassContextTimer` — context manager accumulating into an object;
  * `@accumulate_time` — method decorator storing per-call statistics
    on the instance (`_timers`);
  * `ClassTimer` — aggregates and formats those statistics and
    `.store(folder)` dumps them as CSV per mission, like the
    reference's timing dumps (wvn_learning_node.py:109-127,161).

JAX caveat handled here: dispatch returns before the device finishes,
so timers optionally `block_until_ready` on the wrapped result
(block=True) for honest device timings; the runtime uses block=False
to keep the pipeline async and relies on jax.profiler for device-side
traces (see `profile_trace`).
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from functools import wraps

import numpy as np


class Timer:
    def __init__(self, name: str = "", verbose: bool = True):
        self.name = name
        self.verbose = verbose
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        if self.verbose:
            print(f"Time {self.name}: {self.elapsed * 1e3:.2f} ms")
        return False


def accumulate_time(method=None, *, block: bool = False):
    """Decorator: accumulate per-call wall time into `self._timers`."""

    def deco(fn):
        @wraps(fn)
        def wrapper(self, *args, **kwargs):
            t0 = time.perf_counter()
            out = fn(self, *args, **kwargs)
            if block:
                try:
                    import jax

                    jax.block_until_ready(out)
                except Exception:
                    pass
            dt = time.perf_counter() - t0
            if not hasattr(self, "_timers"):
                self._timers = defaultdict(list)
            self._timers[fn.__name__].append(dt)
            return out

        return wrapper

    if method is not None:
        return deco(method)
    return deco


class ClassTimer:
    """Aggregate the `_timers` of several objects (reference
    pytictac.ClassTimer usage at wvn_learning_node.py:109-127)."""

    def __init__(self, objects, names, enabled: bool = True):
        self._objects = objects
        self._names = names
        self._enabled = enabled

    def rows(self):
        out = []
        for obj, name in zip(self._objects, self._names):
            for method, samples in sorted(getattr(obj, "_timers", {}).items()):
                a = np.asarray(samples) * 1e3
                out.append(
                    {
                        "object": name,
                        "method": method,
                        "calls": len(a),
                        "mean_ms": float(a.mean()),
                        "p50_ms": float(np.percentile(a, 50)),
                        "p95_ms": float(np.percentile(a, 95)),
                        "total_s": float(a.sum() / 1e3),
                    }
                )
        return out

    def __str__(self):
        if not self._enabled:
            return ""
        lines = []
        for r in self.rows():
            lines.append(
                f"{r['object']}.{r['method']}: n={r['calls']} mean={r['mean_ms']:.2f}ms "
                f"p50={r['p50_ms']:.2f}ms p95={r['p95_ms']:.2f}ms total={r['total_s']:.2f}s"
            )
        return "\n".join(lines)

    def store(self, folder: str, filename: str = "timings.csv"):
        os.makedirs(folder, exist_ok=True)
        rows = self.rows()
        path = os.path.join(folder, filename)
        with open(path, "w") as f:
            f.write("object,method,calls,mean_ms,p50_ms,p95_ms,total_s\n")
            for r in rows:
                f.write(
                    f"{r['object']},{r['method']},{r['calls']},{r['mean_ms']:.4f},"
                    f"{r['p50_ms']:.4f},{r['p95_ms']:.4f},{r['total_s']:.4f}\n"
                )
        return path


class ClassContextTimer:
    """Context manager accumulating into an object's `_timers` under a
    given name (reference ClassContextTimer around the train step,
    wvn_learning_node.py:363)."""

    def __init__(self, parent_obj, block_name: str, parent_method_name: str = ""):
        self._obj = parent_obj
        self._name = block_name

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        if not hasattr(self._obj, "_timers"):
            self._obj._timers = defaultdict(list)
        self._obj._timers[self._name].append(dt)
        return False


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace", enabled: bool = True):
    """jax.profiler trace context — the device-side complement to the
    host timers (view with tensorboard / xprof)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
