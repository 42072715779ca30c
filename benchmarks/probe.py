"""Transport probe shared by the benchmark harnesses (VERDICT r4 #3).

A fixed trivial jitted dispatch, value-fenced, whose latency isolates
TRANSPORT (axon relay round trip + dispatch overhead) from framework
work — the same probe tools/soak.py uses to adjudicate rate drift.
Benches record its series per section so a slow/jittery measurement
window can be attributed: if a section's p95 inflates while the probe's
does too, the relay was congested, not the framework.

Importable (`make_probe`) and runnable:
  python benchmarks/probe.py   ->  {"probe_ms_p50": ..., "probe_ms_p95": ...}
"""

from __future__ import annotations

import json
import time


def make_probe():
    """Returns probe_ms(n) -> median ms per value-fenced trivial dispatch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    probe_x = jax.device_put(np.ones((8, 128), np.float32))

    @jax.jit
    def _probe(x, c):
        return jnp.sum(x) * 1e-9 + c

    float(_probe(probe_x, jnp.float32(0.0)))  # compile outside any timing

    def probe_ms(n: int = 10) -> float:
        t0 = time.time()
        c = 0.0
        for _ in range(n):
            c = float(_probe(probe_x, jnp.float32(c)))  # fence every dispatch
        return round((time.time() - t0) / n * 1e3, 2)

    return probe_ms


def main() -> int:
    import numpy as np

    probe_ms = make_probe()
    series = [probe_ms(5) for _ in range(8)]
    print(json.dumps({
        "probe_ms_p50": round(float(np.percentile(series, 50)), 2),
        "probe_ms_p95": round(float(np.percentile(series, 95)), 2),
        "series": series,
    }))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
