"""Consolidated benchmark artifact (VERDICT r3 #4, r4 #3).

Runs every benchmark the README cites — the pixelwise headline
(bench.py), the online loop (bench_online.py), the config-5 product
runtime in BOTH scoring modes (bench_multicam.py --product
[--pixelwise]), and the non-dino feature modes (bench_feature_modes.py)
— each as a subprocess on the real chip, and writes ONE regenerable
JSON (default results/bench_r05.json) the README numbers cite.

Every child prints its result as the last parseable JSON line of
stdout; this runner records that plus wall time, the device, the git
revision AND a dirty-tree flag (the artifact is only citable when
git_rev == HEAD and dirty == false), and a TRANSPORT PROBE sample
(benchmarks/probe.py) taken immediately before each section — so a
slow section can be adjudicated against the relay's state at that
moment. A child that fails records its error instead of aborting the
sweep (the relay occasionally drops a connection; partial artifacts
beat none), and the top-level "ok" flag goes false.

Usage:
  python benchmarks/bench_all.py                 # full sweep -> results/bench_r05.json
  python benchmarks/bench_all.py --only online   # one section, for iteration
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# (key, argv, timeout_s). Paths relative to the repo root.
SECTIONS = [
    ("headline_pixelwise", [sys.executable, "bench.py"], 900),
    ("online_loop", [sys.executable, "benchmarks/bench_online.py"], 900),
    (
        "config5_product_patchres",
        [sys.executable, "benchmarks/bench_multicam.py", "--product"],
        900,
    ),
    (
        "config5_product_pixelwise",
        [sys.executable, "benchmarks/bench_multicam.py", "--product", "--pixelwise"],
        900,
    ),
    (
        # the opt-in statically-calibrated int8 backbone at the same
        # product shape (VERDICT r4 #5: the winning mode belongs in the
        # primary artifact, not a side experiment)
        "config5_product_patchres_int8",
        [sys.executable, "benchmarks/bench_multicam.py", "--product", "--quant", "int8_static"],
        900,
    ),
    ("feature_modes", [sys.executable, "benchmarks/bench_feature_modes.py"], 1200),
]


def _last_json(stdout: str):
    """Return the last stdout line that parses as JSON, or None."""
    for line in reversed(stdout.splitlines()):
        line = line.strip()
        if not line.startswith(("{", "[")):
            continue
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return None


def run_section(key: str, argv: list, timeout: int) -> dict:
    t0 = time.time()
    try:
        proc = subprocess.run(
            argv, cwd=REPO, capture_output=True, text=True, timeout=timeout
        )
    except subprocess.TimeoutExpired:
        return {"ok": False, "error": f"timeout after {timeout}s", "cmd": " ".join(argv)}
    wall = round(time.time() - t0, 1)
    result = _last_json(proc.stdout)
    if proc.returncode != 0 or result is None:
        return {
            "ok": False,
            "error": f"rc={proc.returncode}, parsed={result is not None}",
            "stderr_tail": proc.stderr[-2000:],
            "cmd": " ".join(argv),
            "wall_s": wall,
        }
    return {"ok": True, "cmd": " ".join(argv[1:]), "wall_s": wall, "result": result}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="results/bench_r05.json")
    ap.add_argument("--only", type=str, default=None,
                    help="run one section by key substring (e.g. 'online')")
    args = ap.parse_args()

    try:
        rev = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
            capture_output=True, text=True,
        ).stdout.strip()
        # PROGRESS.jsonl is appended by the session driver between
        # commits (telemetry, not source); it does not make the
        # artifact uncitable, so it is excluded from the dirty flag.
        status = subprocess.run(
            ["git", "status", "--porcelain"], cwd=REPO,
            capture_output=True, text=True,
        ).stdout.strip().splitlines()
        dirty = any(not line.endswith("PROGRESS.jsonl") for line in status)
    except OSError:
        rev, dirty = "unknown", True

    sections = [s for s in SECTIONS if args.only is None or args.only in s[0]]
    if not sections:
        print(f"no section matches --only {args.only!r}", file=sys.stderr)
        return 2

    out = {
        "git_rev": rev,
        # the README may cite this artifact only when it was generated
        # at a clean checkout of the revision it claims (VERDICT r4 #3)
        "git_dirty": dirty,
        "generated_by": "python benchmarks/bench_all.py",
        "sections": {},
    }
    for key, argv, timeout in sections:
        print(f"== {key}: {' '.join(argv[1:])}", flush=True)
        # transport-probe sample immediately before the section: the
        # relay's round-trip latency at measurement time, for
        # adjudicating slow/jittery sections (benchmarks/probe.py)
        # the tunnel's PJRT init sporadically hangs (see the verify
        # recipe); a hung probe is an init artifact, not a transport
        # sample, so retry once with a short leash before giving up
        probe = run_section(f"probe_before_{key}",
                            [sys.executable, "benchmarks/probe.py"], 120)
        if not probe.get("ok"):
            probe = run_section(f"probe_before_{key}",
                                [sys.executable, "benchmarks/probe.py"], 120)
        section = run_section(key, argv, timeout)
        section["probe_before"] = probe.get("result", {"error": probe.get("error")})
        out["sections"][key] = section
        print(json.dumps(out["sections"][key].get("result",
                                                  out["sections"][key]))[:400], flush=True)

    # device string from any child that reported one, else query locally
    try:
        import jax  # noqa: deferred — only for the label, after children ran

        out["device"] = str(jax.devices()[0])
    except Exception as e:  # pragma: no cover — label only
        out["device"] = f"unavailable ({e})"

    out["ok"] = all(s.get("ok") for s in out["sections"].values())
    path = REPO / args.out
    os.makedirs(path.parent, exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path} ok={out['ok']}")
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
