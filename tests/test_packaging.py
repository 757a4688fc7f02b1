"""spark-submit --py-files packaging smoke (north-rule deliverable).

Builds dist/hipipe_spark.zip with tools/package.py, then launches a REAL
``spark-submit --py-files dist/hipipe_spark.zip`` subprocess whose job
script imports the engine ONLY from the zip (cwd is a temp dir, so the
repo checkout is not importable) and runs the flagship as-of featurize
on a tiny synthetic corpus. This is the exact deployment path a
multi-executor cluster uses; local[2] stands in for the cluster
master URL.
"""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(
    os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit")

JOB = textwrap.dedent("""
    import sys
    # guard: the engine must come from the --py-files zip, not the repo
    assert not any(p.rstrip('/').endswith('repo') for p in sys.path[:1])
    from pyspark.sql import SparkSession, functions as F

    from hipipe_spark.datagen import gen_transcripts, gen_profile_updates
    from hipipe_spark.operators.flagship import featurize

    spark = (SparkSession.builder.master("local[2]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false").getOrCreate())
    turns = gen_transcripts(spark, n_convs=50, seed=7)
    profs = gen_profile_updates(spark, n_convs=50, seed=7)
    out = featurize(turns, profiles=profs, asof_strategy="union")
    n = out.count()
    assert n > 0, n
    assert "conv_id" in out.columns and "turn_idx" in out.columns
    print("PACKAGED_OK", n)
""")


def test_spark_submit_py_files(tmp_path):
    if not os.path.exists(SPARK_SUBMIT):
        pytest.skip("spark-submit not on this box")
    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip().splitlines()[-1]
    assert zip_path.endswith("hipipe_spark.zip") and os.path.exists(zip_path)

    job = tmp_path / "job.py"
    job.write_text(JOB)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    res = subprocess.run(
        [SPARK_SUBMIT, "--py-files", zip_path, str(job)],
        capture_output=True, text=True, timeout=300,
        cwd=str(tmp_path), env=env,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "PACKAGED_OK" in res.stdout, (res.stdout[-1000:],
                                         res.stderr[-2000:])
