"""Two-parallelism-level scaling evidence (BASELINE.md protocol).

Runs the flagship feature pipeline over the identical synthetic
transcript corpus at local[N] and local[4N] in separate JVMs (fresh
process per level so executor threads are truly capped), reports
throughput at each plus scaling efficiency = T(4N) / (4 * T(N)),
and appends the result to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from hipipe_spark.session import get_spark
from hipipe_spark.datagen import gen_profile_updates, gen_transcripts
from hipipe_spark.operators.flagship import featurize

cores = int(sys.argv[1])
n_convs = int(sys.argv[2])
spark = get_spark(app_name=f"scaling_{cores}", cores=cores,
                  shuffle_partitions=max(cores * 2, 8))
turns = gen_transcripts(spark, n_convs=n_convs, avg_turns=20,
                        hot_frac=0.01, hot_mult=50).persist()
profiles = gen_profile_updates(spark, n_convs=n_convs)
n = turns.count()
t0 = time.time()
rows = featurize(turns, profiles).count()
dt = time.time() - t0
assert rows == n
print(json.dumps({"cores": cores, "n_turns": n, "sec": round(dt, 3),
                  "turns_per_sec": round(n / dt, 1)}))
"""


def run(cores: int, n_convs: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": REPO}, str(cores), str(n_convs)],
        capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main(n: int = 8, n_convs: int = 20000) -> None:
    lo = run(n, n_convs)
    hi = run(n * 4, n_convs)
    eff = hi["turns_per_sec"] / (4 * lo["turns_per_sec"])
    result = {"N": lo, "fourN": hi, "scaling_efficiency": round(eff, 3),
              "date": datetime.now(timezone.utc).isoformat(timespec="seconds")}
    print(json.dumps(result))
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    header = not os.path.exists(md)
    with open(md, "a") as f:
        if header:
            f.write(
                "# BENCH — measured throughput & scaling\n\n"
                "Flagship feature pipeline (sessionize + lag/lead + rolling +\n"
                "backfill + as-of profile join) over deterministic synthetic\n"
                "transcripts with 1% hot conversations holding ~half the rows.\n"
                "Input persisted before timing; pipeline + count timed.\n\n"
                "| date | n_turns | local[N] cores | T(N) s | turns/s @N | "
                "local[4N] cores | T(4N) s | turns/s @4N | efficiency T(4N)/(4·T(N)) |\n"
                "|---|---|---|---|---|---|---|---|---|\n"
            )
        f.write(
            f"| {result['date']} | {lo['n_turns']} | {lo['cores']} | {lo['sec']} "
            f"| {lo['turns_per_sec']} | {hi['cores']} | {hi['sec']} "
            f"| {hi['turns_per_sec']} | {result['scaling_efficiency']} |\n"
        )


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    main(n, n_convs)
