"""The reference's canonical end-to-end example, re-expressed.

Mirrors /root/reference/test/core/stream/example.cpp:26-67 (the README
pipeline): create → transform(age+1) → transform(dim2 char+1) →
transform(login,age → age+len) → probabilistic rename → drop →
transform(age → login) → filter(age>30) → unpack, expecting ages
{45, 64}. The probabilistic stage uses deterministic key-derived rolls
(the engine's upgrade over the reference's irreproducible PRNG) and, as
in the reference, must not affect the asserted ages."""

from pyspark.sql import functions as F

from hipipe_spark.operators.core import (
    Drop, Filter, Transform, create, unpack,
)
from hipipe_spark.plans.pipeline import Pipeline


def test_example_pipeline(spark):
    data = [("marry", 24), ("ted", 41), ("anna", 16), ("josh", 59)]
    df = create(spark, data, schema="login string, age int", n_partitions=2)

    pipe = Pipeline([
        Transform("age", "age", lambda a: a + 1),
        # dim-2 over the characters of login: a->b, e->f, ...
        Transform(
            "login", "login",
            lambda l: F.array_join(
                F.transform(
                    F.split(l, ""),
                    lambda c: F.when(c == "", c).otherwise(F.char(F.ascii(c) + 1)),
                ),
                "",
            ),
        ),
        Transform(["login", "age"], "age", lambda l, a: a + F.length(l)),
        Transform("login", "login", lambda l: F.lit("buzz"),
                  prob=0.5, key="age", seed=1),
        Drop("login"),
        Transform(
            "age", "login",
            lambda a: F.concat(F.lit("person_"), a.cast("string"), F.lit("_years_old")),
        ),
        Filter(["age"], lambda a: a > 30),
    ])
    out = pipe(df)
    ages = sorted(unpack(out, "age"))
    assert ages == [45, 64]


def test_example_chain_spelling(spark):
    """df | stage | stage — the hipipe operator| spelling works too."""
    df = create(spark, [("a", 1), ("b", 2)], schema="k string, v int")
    out = df | Transform("v", "v", lambda v: v * 10) | Filter(["v"], lambda v: v > 10)
    assert unpack(out, "v") == [20]
