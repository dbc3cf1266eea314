#!/usr/bin/env python
"""sf0.1 -> sf1 scale rehearsal: observed scaling exponents for the
most expensive queries.

The 100 TB story rests on plan-shape arguments (blocked pair
formation, bounded frames, broadcast sides, sp_corpus_windows = 0).
This script converts it from argued to observed at one decade: run
the N most expensive keys (by BENCH_FULL.json) at sf0.1 and at the
locally generated sf1 (scripts/gen_sf1_fixtures.py — 10x rows), and
report per-query wall-clock with the scaling exponent

    alpha = log10(t_sf1 / t_sf01)

alpha <= 1 means at-most-linear in data size over the decade;
local-mode job-launch floors push alpha DOWN for sub-second queries
(fixed overhead amortizes), while an accidental O(n^2) pair
explosion pushes it toward 2. Queries are timed by bench.py itself
(same noop-write, warm-plan/cold-data protocol), one subprocess per
scale so the two sessions cannot share caches.

Usage:
    python scripts/gen_sf1_fixtures.py        # once
    python scripts/scale_rehearsal.py [N]     # default 20

Second decade (r11 verdict #4): pass --from/--to to rehearse any
fixture pair, e.g. sf1 -> sf10 after gen_sf10_fixtures.py:

    python scripts/scale_rehearsal.py --keys k1,k2 \
        --from .scratch/sf1 --to .scratch/sf10 --out SCALE_SF10.json

Prints a markdown table ready for BASELINE.md and writes the JSON
(default SCALE_REHEARSAL.json).
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(ROOT, ".scratch", "sf1")


def bench(sf_dir: str, keys: list[str]) -> dict[str, float]:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        BENCH_QUERIES=",".join(keys),
        BENCH_PASSES="2",
        BENCH_REPS="2",
    )
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        cwd=ROOT,
        check=True,
    )
    # the stdout line is the compact HEADLINE subset only — the full
    # per-query map is the BENCH_FULL.json sidecar, snapshot it
    # before the next run overwrites it
    with open(os.path.join(ROOT, "BENCH_FULL.json")) as f:
        return json.load(f)["queries"]


def main() -> None:
    argv = sys.argv[1:]

    def opt(name: str, default: str | None) -> str | None:
        if name in argv:
            i = argv.index(name)
            v = argv[i + 1]
            del argv[i : i + 2]
            return v
        return default

    lo_dir = opt("--from", "/root/testdata/sf0.1")
    hi_dir = opt("--to", SF1)
    out_path = opt("--out", "SCALE_REHEARSAL.json")
    keys_arg = opt("--keys", None)
    if not os.path.isabs(lo_dir):
        lo_dir = os.path.join(ROOT, lo_dir)
    if not os.path.isabs(hi_dir):
        hi_dir = os.path.join(ROOT, hi_dir)
    if keys_arg:
        keys = keys_arg.split(",")
    else:
        n = int(argv[0]) if argv else 20
        with open(os.path.join(ROOT, "BENCH_FULL.json")) as f:
            full = json.load(f)
        if len(full["queries"]) < 100:
            sys.exit(
                "BENCH_FULL.json holds a partial sweep — run the full"
                " bench first or pass --keys k1,k2,..."
            )
        ranked = sorted(full["queries"].items(), key=lambda kv: -kv[1])
        keys = [k for k, _ in ranked[:n]]
    if not os.path.isdir(hi_dir):
        sys.exit(f"{hi_dir} missing — run the matching gen_*_fixtures.py")
    print(
        f"rehearsing {len(keys)} keys at {lo_dir} then {hi_dir} ...",
        flush=True,
    )
    t01 = bench(lo_dir, keys)
    print("low-scale pass done", flush=True)
    t1 = bench(hi_dir, keys)
    print("high-scale pass done", flush=True)
    rows = []
    for k in keys:
        a, b = t01.get(k), t1.get(k)
        if not a or not b:
            continue
        rows.append((k, a, b, math.log10(b / a)))
    rows.sort(key=lambda r: -r[3])
    print("\n| query | sf0.1 s | sf1 s | alpha |")
    print("| --- | --- | --- | --- |")
    for k, a, b, al in rows:
        print(f"| {k} | {a:.3f} | {b:.3f} | {al:+.2f} |")
    tot01, tot1 = sum(r[1] for r in rows), sum(r[2] for r in rows)
    print(
        f"\nTOTAL sf0.1 {tot01:.2f} s -> sf1 {tot1:.2f} s "
        f"(alpha {math.log10(tot1 / tot01):+.2f})"
    )
    mode = "r+" if os.path.exists(os.path.join(ROOT, out_path)) else None
    payload = {
        "keys": {
            k: {"lo": a, "hi": b, "alpha": round(al, 3)}
            for k, a, b, al in rows
        },
        "lo_dir": lo_dir,
        "hi_dir": hi_dir,
        "total_lo": round(tot01, 3),
        "total_hi": round(tot1, 3),
    }
    dest = os.path.join(ROOT, out_path)
    if mode and out_path == "SCALE_REHEARSAL.json":
        # preserve prior named sections (r11_new_operators etc.)
        with open(dest) as f:
            prior = json.load(f)
        prior.update(payload)
        payload = prior
    with open(dest, "w") as f:
        json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
