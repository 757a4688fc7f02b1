"""Probabilistic record linkage: Fellegi–Sunter scoring.

The decision layer of entity resolution: blocking (this engine's
LSH / length-band / exact-key operators) proposes candidate pairs;
Fellegi–Sunter (1969) turns per-field agreement patterns into a
log-likelihood-ratio match weight ``Σ log2(m_i/u_i)`` (agreeing
fields) ``+ Σ log2((1−m_i)/(1−u_i))`` (disagreeing), thresholded
into link / possible / non-link. hipipe has no join at all
(SURVEY §0); this supplies the classic linkage calculus over any
blocked candidate frame.

``m`` (P(agree | same entity)) and ``u`` (P(agree | different
entity)) are caller-supplied per field — estimated upstream from
labeled pairs or an EM fit; with FIXED parameters the score is pure
column arithmetic: deterministic, one projection, no shuffle beyond
whatever produced the candidates.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fs_link_score(pairs: DataFrame, agreement_cols: Sequence[str],
                  m: Sequence[float], u: Sequence[float],
                  upper: float = 3.0, lower: float = -3.0) -> DataFrame:
    """Score blocked candidate pairs: ``weight`` = Σ over fields of
    ``log2(m/u)`` when the boolean ``agreement_cols[i]`` holds else
    ``log2((1−m)/(1−u))``; ``decision`` ∈ {'link', 'possible',
    'non_link'} via the two thresholds. Null agreement = disagree
    (conservative). Per-field log weights are Python-computed
    literals ROUNDED to 6dp (the rounded-handoff pattern), so the
    fold is bit-identical in any engine.

    Output: the input pair columns + ``weight`` (double, rounded 4)
    + ``decision`` (string).
    """
    if not (len(agreement_cols) == len(m) == len(u)):
        raise ValueError("agreement_cols, m, u must align")
    for mi, ui in zip(m, u):
        if not (0 < ui < mi < 1):
            raise ValueError(f"need 0 < u < m < 1, got m={mi}, u={ui}")
    weight = F.lit(0.0)
    for col, mi, ui in zip(agreement_cols, m, u):
        agree = round(math.log2(mi / ui), 6)
        disagree = round(math.log2((1 - mi) / (1 - ui)), 6)
        weight = weight + F.when(F.col(col), F.lit(agree)) \
            .otherwise(F.lit(disagree))
    out = pairs.withColumn("weight", F.round(weight, 4))
    return out.withColumn(
        "decision",
        F.when(F.col("weight") >= upper, "link")
         .when(F.col("weight") <= lower, "non_link")
         .otherwise("possible"))
