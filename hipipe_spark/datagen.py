"""Deterministic synthetic conversation-transcript tables.

Generates the north-rule input table (BASELINE.json:input_hint):
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` plus the as-of right side ``profile_updates
(conv_id, ts, model, temperature)`` (FIXTURES.md F1/F2).

Design constraints honored:

- **Deterministic**: every value is a pure function of (seed, conv, turn)
  via :mod:`hipipe_spark.functions.hashing` — same output at any
  parallelism, mirroring the reference's seeded-PRNG test discipline
  (``test/core/stream/transform4.cpp:74-76``) but fixing its
  irreproducible ``random_device`` seeding (``utility/random.hpp:21``).
- **Skew fixture**: the first ``hot_frac`` of conversations carry
  ``hot_mult``× the turns of a normal conversation (~1% of convs →
  ~half the rows at the defaults), so skew handling is testable.
- **Scales**: generation is ``spark.range`` → expressions → one window
  cumulative-sum; no driver-side loops, no Python UDFs. At 10^12 turns
  you would raise ``n_convs`` and let the range partition.
- **Adversarial details** for correctness tests: duplicate timestamps
  within a conversation (tie-break ordering), gaps > session threshold
  (sessionization), text containing quotes/newlines/unicode
  (byte-equality), rows emitted in hash order (out-of-order writes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hipipe_spark.functions.hashing import det_hash_i64

_WORDS = [
    "the", "merge", "plan", "refactor", "deploy", "spark", "shuffle",
    "vector", "token", "assist", "query", "window", "stream", "batch",
    "column", "\"quoted\"", "line\nbreak", "naïve", "tab\tsep", "ok",
]

BASE_TS = "2024-01-01 00:00:00"


def gen_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    avg_turns: int = 20,
    hot_frac: float = 0.01,
    hot_mult: int = 50,
    seed: int = 42,
    session_gap_sec: int = 1800,
) -> DataFrame:
    """Build the transcripts DataFrame. Rows ≈ n_convs * avg_turns * ~1.5
    (hot conversations included)."""
    n_hot = max(1, int(n_convs * hot_frac))
    conv = spark.range(n_convs).withColumnRenamed("id", "conv")
    h = lambda k, s: det_hash_i64(k, seed * 1000 + s)  # noqa: E731

    conv = conv.withColumn(
        "n_turns",
        F.when(
            F.col("conv") < n_hot,
            (F.lit(avg_turns * hot_mult) + F.pmod(h(F.col("conv"), 1), F.lit(avg_turns))),
        ).otherwise(F.lit(2) + F.pmod(h(F.col("conv"), 2), F.lit(2 * avg_turns - 2))),
    )

    turns = conv.select(
        "conv",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    key = F.col("conv") * 131071 + F.col("turn_idx")  # < 2^31 for sane sizes

    # Inter-turn gap: mostly seconds-scale; ~6% zero (duplicate ts ties);
    # ~8% > session threshold (forces a session break).
    r = F.pmod(h(key, 3), F.lit(100))
    gap = (
        F.when(F.col("turn_idx") == 0, F.lit(0))
        .when(r < 6, F.lit(0))
        .when(r < 14, F.lit(session_gap_sec) + F.pmod(h(key, 4), F.lit(7200)))
        .otherwise(F.lit(1) + F.pmod(h(key, 5), F.lit(300)))
    )
    turns = turns.withColumn("gap_sec", gap)

    w = Window.partitionBy("conv").orderBy("turn_idx")
    turns = turns.withColumn("offset_sec", F.sum("gap_sec").over(w))

    role_r = F.pmod(h(key, 6), F.lit(20))
    role = (
        F.when(F.col("turn_idx") == 0, F.lit("system"))
        .when(role_r < 3, F.lit("tool"))
        .when(F.pmod(F.col("turn_idx"), F.lit(2)) == 1, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )

    vocab = F.array(*[F.lit(wd) for wd in _WORDS])
    n_words = 3 + 8  # text = 3..10 hash-picked words
    words = [
        F.element_at(vocab, (F.pmod(h(key, 10 + i), F.lit(len(_WORDS))) + 1).cast("int"))
        for i in range(n_words)
    ]
    text_len = (F.lit(3) + F.pmod(h(key, 7), F.lit(8))).cast("int")
    text = F.concat_ws(" ", F.slice(F.array(*words), 1, text_len))

    out = turns.select(
        F.concat(F.lit("conv_"), F.lpad(F.col("conv").cast("string"), 8, "0")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        F.when(
            role == "tool",
            F.concat(F.lit("tool_"), F.pmod(h(key, 8), F.lit(5)).cast("string")),
        ).otherwise(F.lit("")).alias("tool"),
        (
            F.to_timestamp(F.lit(BASE_TS))
            + F.make_interval(
                secs=(F.pmod(h(F.col("conv"), 9), F.lit(86400 * 7)) + F.col("offset_sec")).cast("double")
            )
        ).alias("ts"),
    )
    # Emit in hash order: downstream must never rely on input ordering.
    return out.orderBy(F.xxhash64("conv_id", "turn_idx"))


def gen_profile_updates(
    spark: SparkSession,
    n_convs: int = 1000,
    updates_per_conv: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Sparse per-conversation state changes for the as-of join right side
    (FIXTURES.md F2). Update timestamps deliberately interleave with turn
    timestamps (same BASE_TS + bounded offsets)."""
    h = lambda k, s: det_hash_i64(k, seed * 2000 + s)  # noqa: E731
    df = (
        spark.range(n_convs)
        .withColumnRenamed("id", "conv")
        .select(
            "conv",
            F.explode(
                F.sequence(F.lit(0), F.lit(0) + F.pmod(det_hash_i64(F.col("conv"), seed * 2000), F.lit(updates_per_conv * 2 - 1)))
            ).alias("upd"),
        )
    )
    key = F.col("conv") * 131071 + F.col("upd") * 7919
    return df.select(
        F.concat(F.lit("conv_"), F.lpad(F.col("conv").cast("string"), 8, "0")).alias("conv_id"),
        (
            F.to_timestamp(F.lit(BASE_TS))
            + F.make_interval(
                secs=(F.pmod(h(F.col("conv"), 9), F.lit(86400 * 7)) + F.col("upd") * 600 + F.pmod(h(key, 1), F.lit(1200))).cast("double")
            )
        ).alias("ts"),
        F.concat(F.lit("model_v"), F.pmod(h(key, 2), F.lit(4)).cast("string")).alias("model"),
        (F.pmod(h(key, 3), F.lit(100)) / 100.0).alias("temperature"),
    )


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-key the driver's ``events`` table as a transcripts table so
    driver-side correctness checks (DuckDB oracle over the same parquet)
    can exercise the temporal operators on shared data.

    Mapping: user_id → conv_id, event order within user → turn_idx,
    event_type → role-ish, props → text, value-derived tool, ts → ts.
    Entirely deterministic (row_number over a total order).
    """
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.concat(F.lit("conv_"), F.lpad(F.col("user_id").cast("string"), 8, "0")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
            (F.pmod(det_hash_i64(F.col("event_id"), 7), F.lit(4)) + 1).cast("int"),
        ).alias("role"),
        F.coalesce(F.col("props"), F.lit("")).alias("text"),
        F.coalesce(F.col("event_type"), F.lit("")).alias("tool"),
        F.col("ts"),
    )
