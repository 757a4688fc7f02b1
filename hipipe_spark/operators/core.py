"""hipipe stream-operator parity layer, Spark-shaped (SURVEY.md §2.1).

Each class re-expresses one reference operator as a DataFrame stage.
Semantics are preserved; the execution strategy is Spark's: batches are
Arrow record batches / partitions, fusion is Catalyst + whole-stage
codegen, prefetch is executor pipelining.

Column references are by *name* (Spark's dynamic schema) where the
reference keys columns by C++ type (``HIPIPE_DEFINE_COLUMN``,
``include/hipipe/core/stream/column_t.hpp:251-255``); missing columns
raise AnalysisException at plan time — the analog of the reference's
compile-time static_asserts (``transform.hpp:52-59``).

Dimension semantics (reference ``doc/mainpage.md:117-148``):
dim 1 = per row (the default), dim 2 = per element inside an array
column (``F.transform`` / ``F.filter`` higher-order functions),
dim 0 = whole Arrow batch (``mapInPandas``).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hipipe_spark.functions.hashing import det_hash01
from hipipe_spark.plans.pipeline import Stage


# ---------------------------------------------------------------- sources
def create(spark: SparkSession, data, schema, n_partitions: int | None = None) -> DataFrame:
    """Source: materialize rows into a DataFrame (reference ``create``,
    ``include/hipipe/core/stream/create.hpp:103-104`` — chunk a range into
    batches and unzip tuples into named columns). Batching is implicit in
    Spark (partitions × Arrow maxRecordsPerBatch); ``n_partitions`` is the
    batch-count analog."""
    df = spark.createDataFrame(data, schema=schema)
    if n_partitions:
        df = df.repartition(n_partitions)
    return df


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition when the plan has fewer partitions than
    cores. Small-file scans (one partition per tiny file) serialize
    expression-heavy per-row work — e.g. a 5k-doc parquet landing in ONE
    task leaves 31 of 32 cores idle through a tokenize+score pipeline.
    The repartition is a narrow-ish exchange of the raw rows, amortized
    immediately by the per-row work; at real scale (many splits) it is
    a no-op. The Spark analog of the reference's rebatch-for-throughput
    (``rebatch.hpp:131-166``)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_cached(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Attach persisted intermediates to a returned plan so callers can
    free them after materializing: operators that persist a reused base
    frame (minhash/ngram pair generators, multi-clustering splits) cannot
    unpersist before returning — the caller hasn't run the plan yet — so
    the CALLER owns the cache lifetime. Call :func:`release_cached` on
    the result once it has been materialized (written / collected)."""
    prev = getattr(result, "_hipipe_cached", ())
    result._hipipe_cached = (*prev, *cached)
    return result


def release_cached(df: DataFrame) -> None:
    """Unpersist every intermediate an operator registered on ``df`` via
    :func:`register_cached`. Safe to call repeatedly; long-lived sessions
    running repeated dedup passes should call this after each pass or
    cached blocks accumulate."""
    for c in getattr(df, "_hipipe_cached", ()):
        try:
            c.unpersist()
        except Exception:
            pass
    df._hipipe_cached = ()


# ------------------------------------------------------------- transforms
def _nested_transform(col: Column, fn: Callable[[Column], Column],
                      depth: int) -> Column:
    """Apply ``fn`` to array elements ``depth`` levels deep via nested
    JVM ``F.transform`` — the engine's analog of the reference's
    per-dimension function wrapping (``transform.hpp:126-159``)."""
    if depth <= 0:
        return fn(col)
    return F.transform(col, lambda x: _nested_transform(x, fn, depth - 1))


class Transform(Stage):
    """Vectorized map over columns (reference ``transform``,
    ``include/hipipe/core/stream/transform.hpp:210-235``).

    - ``fn`` takes one ``Column`` per ``from_cols`` entry and returns a
      Column (or tuple of Columns, one per ``to_cols``) — the JVM-side
      fast path (whole-stage codegen; no Python at runtime).
    - ``dim=2`` applies ``fn`` per array element via ``F.transform``
      (fn receives element Columns).
    - ``cond=<col>`` (reference ``transform.hpp:332-376``): apply only
      where the bool column is true, keep the existing ``to`` value
      elsewhere (``to`` must exist, as in the reference).
    - ``prob=p, key=<col>`` (reference ``transform.hpp:461-503``): apply
      with probability p, identity otherwise. Where the reference rolls a
      thread-local mt19937 (irreproducible), we derive the dice roll from
      ``det_hash01(key, seed)`` — bit-reproducible at any parallelism;
      p<=0 ⇒ never, p>=1 ⇒ always (``transform.hpp:433-437``).
    """

    def __init__(self, from_cols: str | Sequence[str], to_cols: str | Sequence[str],
                 fn: Callable[..., Column], dim: int = 1,
                 cond: str | Column | None = None,
                 prob: float | None = None, key: str | Column | None = None,
                 seed: int = 0):
        self.from_cols = [from_cols] if isinstance(from_cols, str) else list(from_cols)
        self.to_cols = [to_cols] if isinstance(to_cols, str) else list(to_cols)
        super().__init__(f"transform({','.join(self.from_cols)}→{','.join(self.to_cols)})")
        self.fn, self.dim, self.cond, self.prob, self.key, self.seed = (
            fn, dim, cond, prob, key, seed)

    def _results(self, df: DataFrame) -> list[Column]:
        ins = [F.col(c) for c in self.from_cols]
        if self.dim >= 2:
            # arbitrary depth, mirroring the reference's dim recursion
            # (transform.hpp:126-159): dim k applies fn to elements k-1
            # arrays deep, via nested JVM higher-order F.transform
            if len(self.from_cols) != 1 or len(self.to_cols) != 1:
                raise ValueError("dim>=2 transform takes one array column")
            return [_nested_transform(ins[0], self.fn, self.dim - 1)]
        out = self.fn(*ins)
        return list(out) if isinstance(out, (tuple, list)) else [out]

    def apply(self, df: DataFrame) -> DataFrame:
        res = self._results(df)
        if len(res) != len(self.to_cols):
            raise ValueError(f"fn returned {len(res)} columns, expected {len(self.to_cols)}")
        gate = None
        if self.cond is not None and self.prob is not None:
            raise ValueError("cond and prob are mutually exclusive")
        if self.cond is not None:
            gate = F.col(self.cond) if isinstance(self.cond, str) else self.cond
        elif self.prob is not None:
            if self.prob >= 1.0:
                gate = None  # always apply
            elif self.prob <= 0.0:
                return df    # identity (to-cols must pre-exist, as in ref)
            else:
                if self.key is None:
                    raise ValueError("prob transform needs a key column for "
                                     "deterministic dice rolls")
                k = F.col(self.key) if isinstance(self.key, str) else self.key
                gate = det_hash01(k, self.seed) < F.lit(self.prob)
        for name, col in zip(self.to_cols, res):
            if gate is not None:
                col = F.when(gate, col).otherwise(F.col(name))
            df = df.withColumn(name, col)
        return df


class BatchTransform(Stage):
    """dim-0 transform: the user function sees the whole Arrow batch as a
    pandas DataFrame (reference ``partial_transform``,
    ``transform.hpp:71-106``, used directly in
    ``test/core/stream/transform1.cpp:42-68``). ``schema`` is the output
    schema (DDL string) — batch functions may add/retype columns."""

    def __init__(self, fn: Callable[[pd.DataFrame], pd.DataFrame], schema: str,
                 name: str = "batch_transform"):
        super().__init__(name)
        self.fn, self.schema = fn, schema

    def apply(self, df: DataFrame) -> DataFrame:
        fn = self.fn

        def runner(batches: Iterable[pd.DataFrame]):
            for pdf in batches:
                yield fn(pdf)

        return df.mapInPandas(runner, schema=self.schema)


class VecTransform(Stage):
    """Arrow-vectorized pandas transform for logic not expressible with
    built-ins: ``fn(pd.Series, ...) -> pd.Series`` applied per batch via
    ``pandas_udf`` (never per-row — the north-rule constraint)."""

    def __init__(self, from_cols: str | Sequence[str], to_col: str,
                 fn: Callable[..., pd.Series], return_type: str):
        self.from_cols = [from_cols] if isinstance(from_cols, str) else list(from_cols)
        super().__init__(f"vec_transform({to_col})")
        self.to_col, self.fn, self.return_type = to_col, fn, return_type

    def apply(self, df: DataFrame) -> DataFrame:
        udf = F.pandas_udf(self.fn, self.return_type)
        return df.withColumn(self.to_col, udf(*[F.col(c) for c in self.from_cols]))


# ------------------------------------------------------------------ filter
class Filter(Stage):
    """Predicate filter at a dimension (reference ``filter``,
    ``include/hipipe/core/stream/filter.hpp:148-163``).

    dim 1: row filter (``pred`` over ``by_cols`` Columns).
    dim 2: filter elements inside an array column (``F.filter``).
    dim 0: drop whole Arrow batches whose summary fails ``pred``
    (reference ``filter.hpp:115-125``); pred receives the batch pdf.

    The reference's per-column divergent lengths (filtering one column
    but not another, ``test/core/stream/filter1.cpp:163-181``) are
    deliberately NOT supported — relationally unrepresentable; columns
    stay row-aligned (SURVEY.md §7.3).
    """

    def __init__(self, by_cols: str | Sequence[str], pred: Callable[..., Column],
                 dim: int = 1, target: str | None = None):
        self.by_cols = [by_cols] if isinstance(by_cols, str) else list(by_cols)
        super().__init__(f"filter({','.join(self.by_cols)})")
        self.pred, self.dim, self.target = pred, dim, target

    def apply(self, df: DataFrame) -> DataFrame:
        if self.dim == 1:
            return df.filter(self.pred(*[F.col(c) for c in self.by_cols]))
        if self.dim >= 2:
            col = self.target or self.by_cols[0]
            # dim k filters elements k-1 arrays deep: F.filter at the
            # innermost level, F.transform descending to it
            def flt(c):
                return F.filter(c, lambda x: self.pred(x))
            out = (flt(F.col(self.by_cols[0])) if self.dim == 2 else
                   _nested_transform(F.col(self.by_cols[0]), flt, self.dim - 2))
            return df.withColumn(col, out)
        if self.dim == 0:
            pred = self.pred

            def runner(batches: Iterable[pd.DataFrame]):
                for pdf in batches:
                    if len(pdf) and pred(pdf):
                        yield pdf

            return df.mapInPandas(runner, schema=df.schema)
        raise ValueError(f"dim {self.dim}")


# --------------------------------------------------- projection / identity
class Keep(Stage):
    """Projection (reference ``keep``, ``keep.hpp:52-53``)."""

    def __init__(self, *cols: str):
        super().__init__(f"keep({','.join(cols)})")
        self.cols = cols

    def apply(self, df: DataFrame) -> DataFrame:
        return df.select(*self.cols)


class Drop(Stage):
    """Column removal (reference ``drop``, ``drop.hpp:52-53``)."""

    def __init__(self, *cols: str):
        super().__init__(f"drop({','.join(cols)})")
        self.cols = cols

    def apply(self, df: DataFrame) -> DataFrame:
        return df.drop(*self.cols)


class Copy(Stage):
    """Duplicate columns (reference ``copy``, ``copy.hpp:37-53``)."""

    def __init__(self, from_cols: str | Sequence[str], to_cols: str | Sequence[str]):
        self.from_cols = [from_cols] if isinstance(from_cols, str) else list(from_cols)
        self.to_cols = [to_cols] if isinstance(to_cols, str) else list(to_cols)
        super().__init__(f"copy({','.join(self.from_cols)})")

    def apply(self, df: DataFrame) -> DataFrame:
        for f_, t in zip(self.from_cols, self.to_cols):
            df = df.withColumn(t, F.col(f_))
        return df


class ForEach(Stage):
    """Side-effect visitor, pass-through (reference ``for_each``,
    ``for_each.hpp:61-77`` — implemented there as an identity transform).
    ``fn`` sees each Arrow batch as a pandas DataFrame on the executor
    (metrics/lineage hooks); data flows through unchanged."""

    def __init__(self, fn: Callable[[pd.DataFrame], None], name: str = "for_each"):
        super().__init__(name)
        self.fn = fn

    def apply(self, df: DataFrame) -> DataFrame:
        fn = self.fn

        def runner(batches: Iterable[pd.DataFrame]):
            for pdf in batches:
                fn(pdf)
                yield pdf

        return df.mapInPandas(runner, schema=df.schema)


# ------------------------------------------------------- generate / random
class Generate(Stage):
    """Fill a column from a deterministic generator expression (reference
    ``generate``, ``generate.hpp:80-95``). ``expr`` is any Column
    expression; for the reference's "counter" generators use
    ``F.row_number().over(...)`` or ``F.sequence``."""

    def __init__(self, to_col: str, expr: Column):
        super().__init__(f"generate({to_col})")
        self.to_col, self.expr = to_col, expr

    def apply(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.to_col, self.expr)


class RandomFill(Stage):
    """Fill with pseudo-random draws (reference ``random_fill``,
    ``random_fill.hpp:48-65``). Upgraded to key-derived determinism:
    uniform [0,1) from ``det_hash01(key, seed)`` so draws are
    reproducible and cluster-size-invariant (the reference's thread_local
    mt19937, ``utility/random.hpp:21``, is neither). ``dist='uniform'``
    or ``'normal'`` (Box-Muller on two derived uniforms)."""

    def __init__(self, to_col: str, key: str, seed: int = 0, dist: str = "uniform"):
        super().__init__(f"random_fill({to_col})")
        self.to_col, self.key, self.seed, self.dist = to_col, key, seed, dist

    def apply(self, df: DataFrame) -> DataFrame:
        k = F.col(self.key)
        u1 = det_hash01(k, self.seed)
        if self.dist == "uniform":
            return df.withColumn(self.to_col, u1)
        if self.dist == "normal":
            u2 = det_hash01(k, self.seed + 1)
            eps = F.lit(1e-12)
            z = F.sqrt(-2.0 * F.log(u1 + eps)) * F.cos(F.lit(6.283185307179586) * u2)
            return df.withColumn(self.to_col, z)
        raise ValueError(self.dist)


# ---------------------------------------------------------------- pad/mask
class Pad(Stage):
    """Rectangularize ragged array columns per group and emit a parallel
    bool mask (reference ``pad``, ``include/hipipe/core/stream/pad.hpp:
    82-96``: pad each example's sequence to the batch max, mask true for
    original elements).

    The reference pads to the *physical batch* max (``pad.hpp:53``) —
    batch boundaries are physical accidents. We pad to the max within a
    logical group (``group_by``; default: the whole table via a constant
    group), the deterministic cluster-size-invariant reading
    (SURVEY.md §7.3).

    ``depth`` mirrors the reference's mask-dimensionality dispatch
    (``pad.hpp:30-44``: the mask column's ndims picks how many dims are
    padded). depth=1 (default): pad the outer array, ``array<bool>``
    mask. depth=2 over ``array<array<T>>``: pad the outer arrays to the
    group max length AND every inner array to the group-wide max inner
    length (per-dimension max, reference ``ndim_pad``,
    ``ndim.hpp:310-328``), with an ``array<array<bool>>`` leaf mask
    built by the reference's resize(true) → pad → resize(false) recipe.
    """

    def __init__(self, col: str, value, group_by: str | None = None,
                 mask_col: str | None = None, depth: int = 1):
        super().__init__(f"pad({col})")
        if depth not in (1, 2):
            raise ValueError("depth 1 or 2")
        self.col, self.value, self.group_by = col, value, group_by
        self.mask_col = mask_col or f"{col}_mask"
        self.depth = depth

    def _maxes(self, df: DataFrame, exprs: dict[str, Column]):
        """Attach per-group (window) or global (agg + broadcast
        crossJoin — NEVER a single-partition window) max columns."""
        if self.group_by:
            w = Window.partitionBy(self.group_by)
            return df, {k: F.max(e).over(w) for k, e in exprs.items()}
        mx = df.agg(*[F.max(e).alias(f"__mx_{k}") for k, e in exprs.items()])
        df = df.crossJoin(F.broadcast(mx))
        return df, {k: F.col(f"__mx_{k}") for k in exprs}

    def _drop_tmp(self, df: DataFrame) -> DataFrame:
        return df.drop(*[c for c in df.columns if c.startswith("__mx_")])

    def apply(self, df: DataFrame) -> DataFrame:
        c = F.col(self.col)
        if self.depth == 1:
            df, mx = self._maxes(df, {"l1": F.size(c)})
            n_pad = (mx["l1"] - F.size(c)).cast("int")
            out = (
                df.withColumn(self.mask_col, F.concat(
                    F.array_repeat(F.lit(True), F.size(c).cast("int")),
                    F.array_repeat(F.lit(False), n_pad)))
                .withColumn(self.col, F.concat(
                    c, F.array_repeat(F.lit(self.value), n_pad)))
            )
            return self._drop_tmp(out)
        # depth == 2: per-dimension maxes over the group
        inner_max = F.coalesce(F.array_max(F.transform(c, F.size)), F.lit(0))
        df, mx = self._maxes(df, {"l1": F.size(c), "l2": inner_max})
        l1, l2 = mx["l1"].cast("int"), mx["l2"].cast("int")
        empty_inner = F.filter(c, lambda x: F.lit(False))  # [] : array<array<T>>
        grow_outer = F.concat(
            c, F.array_repeat(F.flatten(empty_inner),
                              (l1 - F.size(c)).cast("int")))
        padded = F.transform(
            grow_outer,
            lambda inner: F.concat(
                inner, F.array_repeat(F.lit(self.value),
                                      (l2 - F.size(inner)).cast("int"))))
        mask0 = F.transform(
            c, lambda inner: F.array_repeat(F.lit(True), F.size(inner).cast("int")))
        mask_outer = F.concat(
            mask0, F.array_repeat(F.array().cast("array<boolean>"),
                                  (l1 - F.size(c)).cast("int")))
        mask = F.transform(
            mask_outer,
            lambda m: F.concat(
                m, F.array_repeat(F.lit(False), (l2 - F.size(m)).cast("int"))))
        out = (df.withColumn(self.mask_col, mask)
               .withColumn(self.col, padded))
        return self._drop_tmp(out)


# ------------------------------------------------------- rebatch / unpack
class Rebatch(Stage):
    """Re-chunk the stream (reference ``rebatch``, ``rebatch.hpp:131-166``
    — eager pipeline-breaker, order preserved). The Spark analog of a
    pipeline-breaker is an exchange: ``repartition(n)`` (shuffle) or
    ``coalesce(n)`` (no shuffle, narrow). Arrow batch granularity inside
    partitions is the session's ``arrow.maxRecordsPerBatch``."""

    def __init__(self, n_partitions: int, shuffle: bool = False):
        super().__init__(f"rebatch({n_partitions})")
        self.n, self.shuffle = n_partitions, shuffle

    def apply(self, df: DataFrame) -> DataFrame:
        return df.repartition(self.n) if self.shuffle else df.coalesce(self.n)


def unpack(df: DataFrame, cols: str | Sequence[str], dim: int = 1):
    """Sink: drain to driver-side numpy/lists (reference ``unpack``,
    ``unpack.hpp:109-117``; dim behavior ``test/core/stream/unpack.cpp:
    48-93``). dim 1 → one value per row; dim 2 → flatten array elements
    (explode-equivalent done columnar in pandas). Returns a single list
    for one column, else a tuple of lists. Driver-side by definition —
    use only as the terminal stage (like the reference)."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    pdf = df.select(*cols).toPandas()

    def _pyval(x):
        return x.tolist() if hasattr(x, "tolist") else x

    outs = []
    for c in cols:
        s = pdf[c]
        if dim == 2:
            outs.append(
                [_pyval(x) for arr in s if arr is not None for x in arr]
            )
        else:  # dim 0/1: one value per row (arrays come back as lists)
            outs.append([_pyval(x) for x in s])
    return outs[0] if len(outs) == 1 else tuple(outs)


class Buffer(Stage):
    """Async prefetch (reference ``buffer``, ``buffer.hpp:142-177``).
    Spark executors already pipeline stages across cores, so this is a
    planner hint, not a thread pool: ``persist()`` materializes the
    upstream once where a pipeline fans out (the only case where the
    reference's eager buffering has a Spark analog)."""

    def __init__(self, persist: bool = True):
        super().__init__("buffer")
        self.persist = persist
        self._last: DataFrame | None = None

    def apply(self, df: DataFrame) -> DataFrame:
        if not self.persist:
            return df
        self._last = df.persist()
        return self._last

    def release(self) -> None:
        """Unpersist the last buffered frame (the reference buffer's
        drain-on-destruction analog, ``buffer.hpp:170-176``)."""
        if self._last is not None:
            self._last.unpersist()
            self._last = None
