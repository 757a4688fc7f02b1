"""Closed-form regression and residual diagnostics.

The reference's transform layer (``stream/transform.hpp``) produces
feature columns; the natural downstream question — "how do these
features relate, and are the residuals well-behaved?" — is answered
here without any iterative solver: multiple regression with TWO
predictors has an exact closed form in pairwise centered moments
(the 2×2 normal-equation inverse written out), so the whole fit is
ONE map-side-combinable aggregate plus group-dimension arithmetic,
exactly like the stats.py test battery. At 10^12 rows this is the
same cost as any groupBy; no gradient steps, no driver loops.

Design rules inherited from stats.py:

- **Rounded-handoff centering.** All variables are centered on
  ROUNDED (6 dp) broadcast group means before the power sums —
  sums of squares are shift-invariant, and deviation-scale terms
  keep 6-dp output rounding safe from catastrophic cancellation.
- **Rounded coefficients before reuse.** SSE is computed from 7-dp
  rounded slopes on both engines so float noise cannot compound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ols2(df: DataFrame, group: str, y: str, x1: str, x2: str,
         ndigits: int = 6) -> DataFrame:
    """Per-``group`` ordinary least squares of ``y`` on two
    predictors with intercept, solved in closed form: one row per
    group with ``n, b0, b1, b2, se1, se2, t1, t2, r2, adj_r2``.

    With centered moments ``S11, S22, S12, S1y, S2y, Syy`` the
    normal equations invert explicitly::

        det = S11·S22 − S12²
        b1  = (S22·S1y − S12·S2y) / det
        b2  = (S11·S2y − S12·S1y) / det
        SSE = Syy − b1·S1y − b2·S2y          (b rounded to 7 dp first)
        Var(b1) = σ̂²·S22/det,  Var(b2) = σ̂²·S11/det,  σ̂² = SSE/(n−3)

    Null coefficients when the design is singular (det ≤ 0 after
    float noise — collinear or constant predictors) or n < 4.

    Plan: pass 1 aggregates ROUNDED group means (broadcast back),
    pass 2 is ONE aggregate of the six centered second moments plus
    the three first moments; everything after runs on the
    group-dimension frame. Raw rows are never shuffled.
    """
    cy = F.col(y).cast("double")
    c1 = F.col(x1).cast("double")
    c2 = F.col(x2).cast("double")
    mu = df.groupBy(group).agg(
        F.round(F.avg(cy), 6).alias("__my"),
        F.round(F.avg(c1), 6).alias("__m1"),
        F.round(F.avg(c2), 6).alias("__m2"))
    d = (df.join(F.broadcast(mu), group)
           .select(group,
                   (cy - F.col("__my")).alias("dy"),
                   (c1 - F.col("__m1")).alias("d1"),
                   (c2 - F.col("__m2")).alias("d2"),
                   "__my", "__m1", "__m2"))
    dy, d1, d2 = F.col("dy"), F.col("d1"), F.col("d2")
    agg = d.groupBy(group).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.first("__my").alias("my"), F.first("__m1").alias("m1"),
        F.first("__m2").alias("m2"),
        F.sum(d1).alias("u1"), F.sum(d2).alias("u2"),
        F.sum(dy).alias("uy"),
        F.sum(d1 * d1).alias("p11"), F.sum(d2 * d2).alias("p22"),
        F.sum(d1 * d2).alias("p12"),
        F.sum(d1 * dy).alias("p1y"), F.sum(d2 * dy).alias("p2y"),
        F.sum(dy * dy).alias("pyy"))
    n = F.col("n")
    s11 = F.col("p11") - F.col("u1") * F.col("u1") / n
    s22 = F.col("p22") - F.col("u2") * F.col("u2") / n
    s12 = F.col("p12") - F.col("u1") * F.col("u2") / n
    s1y = F.col("p1y") - F.col("u1") * F.col("uy") / n
    s2y = F.col("p2y") - F.col("u2") * F.col("uy") / n
    syy = F.col("pyy") - F.col("uy") * F.col("uy") / n
    det = s11 * s22 - s12 * s12
    ok = (n >= 4) & (det > 0)
    b1 = F.round(F.when(ok, (s22 * s1y - s12 * s2y) / det), 7)
    b2 = F.round(F.when(ok, (s11 * s2y - s12 * s1y) / det), 7)
    # intercept in ORIGINAL units: the rounded-mean handoffs leave a
    # small centered-intercept remainder (uy - b·u)/n that must be
    # ADDED back alongside the mean reconstruction
    b0 = F.when(ok, F.col("my") - b1 * F.col("m1") - b2 * F.col("m2")
                + (F.col("uy") - b1 * F.col("u1")
                   - b2 * F.col("u2")) / n)
    sse = syy - b1 * s1y - b2 * s2y
    sig2 = F.when(ok, sse / (n - 3))
    se1 = F.when(ok, F.sqrt(sig2 * s22 / det))
    se2 = F.when(ok, F.sqrt(sig2 * s11 / det))
    r2 = F.when(ok & (syy > 0), 1.0 - sse / syy)
    adj = F.when(ok & (syy > 0),
                 1.0 - (sse / syy) * (n - 1) / (n - 3))
    t1 = F.when(se1 > 0, b1 / se1)
    t2 = F.when(se2 > 0, b2 / se2)
    return agg.select(
        group, n.cast("bigint").alias("n"),
        F.round(b0, ndigits).alias("b0"),
        F.round(b1, ndigits).alias("b1"),
        F.round(b2, ndigits).alias("b2"),
        F.round(se1, ndigits).alias("se1"),
        F.round(se2, ndigits).alias("se2"),
        F.round(t1, ndigits).alias("t1"),
        F.round(t2, ndigits).alias("t2"),
        F.round(r2, ndigits).alias("r2"),
        F.round(adj, ndigits).alias("adj_r2"))


def durbin_watson(df: DataFrame, key: str, order: list[str],
                  value: str, min_rows: int = 8,
                  ndigits: int = 6) -> DataFrame:
    """Per-``key`` Durbin–Watson statistic on MEAN-CENTERED values in
    ``order``-sequence: ``DW = Σ(d_t − d_{t−1})² / Σd_t²`` with
    ``d = x − x̄_key`` (the rounded-handoff mean). DW ≈ 2 means no
    serial correlation, → 0 positive, → 4 negative — the standard
    residual-independence audit for per-entity metric streams.
    Centering on the key mean makes this the DW of the
    intercept-only regression; detrend upstream (e.g. with
    :func:`ols2` features) for higher-order models. Keys with fewer
    than ``min_rows`` observations return null ``dw`` (the statistic
    is meaningless at tiny n) but keep their row.

    Plan: one broadcast join of rounded key means, one ``lag`` window
    per key (the key exchange is the op's lower bound), one
    aggregate. Output: ``key, n, dw, rho1`` where ``rho1`` is the
    lag-1 autocorrelation implied by ``1 − dw/2``.
    """
    x = F.col(value).cast("double")
    mu = df.groupBy(key).agg(F.round(F.avg(x), 6).alias("__mu"))
    d = (df.join(F.broadcast(mu), key)
           .select(key, *order, (x - F.col("__mu")).alias("__d")))
    w = Window.partitionBy(key).orderBy(*order)
    d = d.withColumn("__p", F.lag("__d").over(w))
    diff = F.col("__d") - F.col("__p")
    agg = d.groupBy(key).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("__d") * F.col("__d")).alias("ss"),
        F.sum(F.when(F.col("__p").isNotNull(), diff * diff)
               .otherwise(F.lit(0.0))).alias("sd"))
    dw = F.when((F.col("n") >= min_rows) & (F.col("ss") > 0),
                F.col("sd") / F.col("ss"))
    return agg.select(
        key, "n",
        F.round(dw, ndigits).alias("dw"),
        F.round(F.when(dw.isNotNull(), 1.0 - dw / 2.0), ndigits)
         .alias("rho1"))


def ols2_influence(df: DataFrame, group: str, y: str, x1: str, x2: str,
                   top_k: int = 5, ndigits: int = 6) -> DataFrame:
    """Per-row influence diagnostics for the :func:`ols2` fit,
    reporting the ``top_k`` highest-Cook's-distance rows per group:
    ``(group, rn, resid, leverage, cooks_d)`` with ``rn`` the
    influence rank. The pieces are all closed-form in the SAME
    centered moments the fit uses::

        h_i  = 1/n + [d1 d2]·S⁻¹·[d1 d2]ᵀ
             = 1/n + (S22·d1² − 2·S12·d1·d2 + S11·d2²)/det
        D_i  = e_i²·h_i / (p·σ̂²·(1−h_i)²),  p = 3

    so influence is ONE more broadcast join of the group-dimension
    fit table followed by per-row JVM arithmetic and a per-group
    top-k window — the group exchange is the only shuffle of raw
    rows, and it carries just the k survivors' worth of ordering
    work (rank, not global sort). Rows in singular groups are
    dropped (no fit → no influence).

    All handoffs (slopes, moments) are rounded exactly as in
    :func:`ols2` so the oracle can reproduce ``cooks_d``
    bit-for-bit; ``resid`` uses the 7-dp slopes.
    """
    cy = F.col(y).cast("double")
    c1 = F.col(x1).cast("double")
    c2 = F.col(x2).cast("double")
    mu = df.groupBy(group).agg(
        F.round(F.avg(cy), 6).alias("__my"),
        F.round(F.avg(c1), 6).alias("__m1"),
        F.round(F.avg(c2), 6).alias("__m2"))
    d = (df.join(F.broadcast(mu), group)
           .select(group,
                   (cy - F.col("__my")).alias("dy"),
                   (c1 - F.col("__m1")).alias("d1"),
                   (c2 - F.col("__m2")).alias("d2")))
    dy, d1, d2 = F.col("dy"), F.col("d1"), F.col("d2")
    agg = d.groupBy(group).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(d1).alias("u1"), F.sum(d2).alias("u2"),
        F.sum(dy).alias("uy"),
        F.sum(d1 * d1).alias("p11"), F.sum(d2 * d2).alias("p22"),
        F.sum(d1 * d2).alias("p12"),
        F.sum(d1 * dy).alias("p1y"), F.sum(d2 * dy).alias("p2y"),
        F.sum(dy * dy).alias("pyy"))
    n = F.col("n")
    s11 = F.col("p11") - F.col("u1") * F.col("u1") / n
    s22 = F.col("p22") - F.col("u2") * F.col("u2") / n
    s12 = F.col("p12") - F.col("u1") * F.col("u2") / n
    s1y = F.col("p1y") - F.col("u1") * F.col("uy") / n
    s2y = F.col("p2y") - F.col("u2") * F.col("uy") / n
    syy = F.col("pyy") - F.col("uy") * F.col("uy") / n
    det = s11 * s22 - s12 * s12
    ok = (n >= 5) & (det > 0)
    b1 = F.round(F.when(ok, (s22 * s1y - s12 * s2y) / det), 7)
    b2 = F.round(F.when(ok, (s11 * s2y - s12 * s1y) / det), 7)
    sse = syy - b1 * s1y - b2 * s2y
    fit = agg.where(ok).select(
        group, n.alias("__n"),
        b1.alias("__b1"), b2.alias("__b2"),
        (F.col("uy") / n).alias("__cy0"),
        (F.col("u1") / n).alias("__c10"),
        (F.col("u2") / n).alias("__c20"),
        F.round(s11, 6).alias("__s11"), F.round(s22, 6).alias("__s22"),
        F.round(s12, 6).alias("__s12"),
        F.round(det, 6).alias("__det"),
        F.round(F.when(n > 3, sse / (n - 3)), 9).alias("__sig2"))
    rows = d.join(F.broadcast(fit), group)
    # residual of the centered fit (centered intercept = means of
    # the centered frame, non-zero only through the rounded handoff)
    e = (dy - F.col("__cy0")
         - F.col("__b1") * (d1 - F.col("__c10"))
         - F.col("__b2") * (d2 - F.col("__c20")))
    e1 = d1 - F.col("__c10")
    e2 = d2 - F.col("__c20")
    h = (1.0 / F.col("__n")
         + (F.col("__s22") * e1 * e1
            - 2.0 * F.col("__s12") * e1 * e2
            + F.col("__s11") * e2 * e2) / F.col("__det"))
    cooks = F.round(
        e * e * h / (3.0 * F.col("__sig2") * (1.0 - h) * (1.0 - h)), 9)
    scored = rows.select(
        group, F.round(e, ndigits).alias("resid"),
        F.round(h, ndigits).alias("leverage"),
        cooks.alias("cooks_d"))
    w = Window.partitionBy(group).orderBy(
        F.col("cooks_d").desc(), F.col("resid").desc())
    return (scored.withColumn("rn", F.row_number().over(w))
                  .where(F.col("rn") <= top_k)
                  .select(group, "rn", "resid", "leverage",
                          F.round(F.col("cooks_d"), ndigits)
                           .alias("cooks_d")))
