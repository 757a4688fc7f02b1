"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at the given SF and compares
against oracle_sql() via DuckDB: row count, sorted column names, and an
order-insensitive value comparison (rows sorted by all columns).
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            def _canon(x):
                import numpy as np
                if x is None:
                    return "<NULL>"
                # only true arrays take the tolist path — a numpy SCALAR
                # NaN (np.float64) must canonicalize like a float NaN,
                # not stringify to "nan"
                if isinstance(x, np.ndarray):
                    return str(x.tolist())
                try:
                    if x != x:  # NaN (plain or numpy scalar)
                        return "<NULL>"
                except ValueError:  # ambiguous elementwise comparison
                    pass
                return str(x)
            pdf[c] = pdf[c].map(_canon)
        # duckdb may hand back int32/uint; unify numerics
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("Int64")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64").round(9)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None):
    import __spark_entry__ as E
    from hipipe_spark.session import get_spark

    spark = get_spark(cores=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, oracles = E.queries(), E.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            plan = fn(spark, sf_dir)
            sdf = plan.toPandas()
            from hipipe_spark.operators.core import release_cached
            release_cached(plan)  # 68 queries, one session: free caches
        except Exception:
            results[name] = ("SPARK-ERROR", traceback.format_exc(limit=4))
            continue
        if name not in oracles:
            results[name] = (f"rows-only ({len(sdf)} rows)", None)
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception:
            results[name] = ("ORACLE-ERROR", traceback.format_exc(limit=2))
            continue
        a, b = normalize(sdf), normalize(odf)
        if list(a.columns) != list(b.columns):
            results[name] = ("SCHEMA-MISMATCH", f"spark={list(a.columns)} oracle={list(b.columns)}")
        elif len(a) != len(b):
            results[name] = ("ROWCOUNT-MISMATCH", f"spark={len(a)} oracle={len(b)}")
        else:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, rtol=1e-8, atol=1e-8)
                results[name] = (f"OK ({len(a)} rows, {time.time()-t0:.1f}s)", None)
            except AssertionError as e:
                diff_cols = []
                for c in a.columns:
                    if not a[c].equals(b[c]):
                        diff_cols.append(c)
                results[name] = ("VALUE-MISMATCH", f"cols={diff_cols}\n{str(e)[:500]}")
    print("\n===== RESULTS =====")
    n_ok = 0
    for name, (status, detail) in results.items():
        flag = "✓" if status.startswith(("OK", "rows-only")) else "✗"
        if flag == "✓":
            n_ok += 1
        print(f"{flag} {name:22s} {status}")
        if detail and flag == "✗":
            print(f"    {detail[:800]}")
    print(f"\n{n_ok}/{len(results)} pass")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    sys.exit(main(only=only))
