"""Dual-parallelism determinism audit.

The oracle gate (check_oracles.py) proves a query's values match DuckDB
at ONE parallelism; it cannot catch results that depend on partition
count or merge order (unstable tie-breaks, first-wins aggregates,
float reduction order beyond the rounded digits). This tool runs each
query in TWO fresh JVMs — local[4] / shuffle.partitions=4 and
local[16] / shuffle.partitions=32 — normalizes exactly like the oracle
gate, and compares per-query value hashes. Every mismatch is a
nondeterminism bug by the repo's own contract (every query is supposed
to be bit-stable at any parallelism).

Usage:
    python tools/check_determinism.py [n_head] [sf_dir]
        n_head: audit the first N registry queries (default 60 — the
                driver window plus margin); 0 = the whole registry.
Writes DETERMINISM.json at the repo root.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

LEVELS = ((4, 4), (16, 32))  # (cores, shuffle partitions)


def _worker(cores: int, parts: int, out_path: str, n_head: int,
            sf_dir: str) -> None:
    import pandas as pd  # noqa: F401

    from check_oracles import normalize
    import __spark_entry__ as E
    from hipipe_spark.session import get_spark

    spark = get_spark(app_name=f"det_audit_{cores}", cores=cores,
                      shuffle_partitions=parts)
    qs = E.queries()
    names = list(qs)[:n_head] if n_head else list(qs)
    hashes: dict[str, str] = {}
    for name in names:
        try:
            plan = qs[name](spark, sf_dir)
            pdf = normalize(plan.toPandas())
            from hipipe_spark.operators.core import release_cached
            release_cached(plan)
            payload = pdf.to_csv(index=False).encode()
            hashes[name] = hashlib.md5(payload).hexdigest()
        except Exception as exc:  # noqa: BLE001
            hashes[name] = f"ERROR: {type(exc).__name__}: {exc}"[:200]
    with open(out_path, "w") as f:
        json.dump(hashes, f)
    spark.stop()


def main(n_head: int = 60,
         sf_dir: str = "/root/testdata/sf0.01") -> int:
    results = []
    for cores, parts in LEVELS:
        out = os.path.join(REPO, f".det_{cores}.json")
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               str(cores), str(parts), out, str(n_head), sf_dir]
        subprocess.run(cmd, check=True)
        with open(out) as f:
            results.append(json.load(f))
        os.remove(out)
    a, b = results
    names = sorted(set(a) | set(b))
    mismatches = {n: {"local4": a.get(n), "local16": b.get(n)}
                  for n in names if a.get(n) != b.get(n)}
    errors = {n: a[n] for n in names
              if str(a.get(n, "")).startswith("ERROR")}
    report = {
        "levels": [f"local[{c}]/sp={p}" for c, p in LEVELS],
        "n_checked": len(names),
        "n_match": len(names) - len(mismatches),
        "mismatches": mismatches,
        "errors": errors,
    }
    with open(os.path.join(REPO, "DETERMINISM.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(f"{report['n_match']}/{report['n_checked']} deterministic "
          f"across {report['levels']}")
    for n, d in mismatches.items():
        print(f"  MISMATCH {n}: {d}")
    return 1 if mismatches else 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
                int(sys.argv[5]), sys.argv[6])
    else:
        n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
        sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
        sys.exit(main(n, sf))
