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

Prints a markdown table ready for BASELINE.md and writes
SCALE_REHEARSAL.json.
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
    if len(sys.argv) > 2 and sys.argv[1] == "--keys":
        keys = sys.argv[2].split(",")
    else:
        n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
        with open(os.path.join(ROOT, "BENCH_FULL.json")) as f:
            full = json.load(f)
        if len(full["queries"]) < 100:
            sys.exit(
                "BENCH_FULL.json holds a partial sweep — run the full"
                " bench first or pass --keys k1,k2,..."
            )
        ranked = sorted(full["queries"].items(), key=lambda kv: -kv[1])
        keys = [k for k, _ in ranked[:n]]
    if not os.path.isdir(SF1):
        sys.exit("sf1 fixtures missing — run scripts/gen_sf1_fixtures.py")
    print(f"rehearsing {len(keys)} keys at sf0.1 then sf1 ...", flush=True)
    t01 = bench("/root/testdata/sf0.1", keys)
    print("sf0.1 pass done", flush=True)
    t1 = bench(SF1, keys)
    print("sf1 pass done", flush=True)
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
    with open(os.path.join(ROOT, "SCALE_REHEARSAL.json"), "w") as f:
        json.dump(
            {
                "keys": {
                    k: {"sf01": a, "sf1": b, "alpha": round(al, 3)}
                    for k, a, b, al in rows
                },
                "total_sf01": round(tot01, 3),
                "total_sf1": round(tot1, 3),
            },
            f,
            indent=1,
        )


if __name__ == "__main__":
    main()
