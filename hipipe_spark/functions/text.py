"""Text-analysis functions for training-data pipelines.

All JVM-side Column expressions (no Python in the hot path): tokenizing,
quality scoring, language-ID heuristics, fingerprinting. These extend
the engine beyond hipipe's operator set (task spec: language-ID, quality
scoring, token counting, document fingerprinting over `documents`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword
# heuristic language ID. Deliberately small and public-knowledge.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "es": ["el", "la", "de", "que", "y", "los", "una", "por"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "que"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["a", "an", "as", "at", "by", "for", "on", "with"]


def tokens(col: Column) -> Column:
    """Whitespace tokenization; empty string → empty array."""
    t = F.trim(col)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(col: Column, toks: Column | None = None) -> Column:
    """Whitespace token count. ``toks``: pre-computed token array to
    share one tokenization across many features (HOF lambdas are not
    subexpression-eliminated, so each call otherwise re-splits)."""
    return F.size(tokens(col) if toks is None else toks).cast("int")


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: split on word/number/punct boundaries
    (a BPE-flavored regex proxy — counts letter-runs, digit-runs, and
    individual punctuation marks)."""
    spaced = F.regexp_replace(col, r"([^\p{L}\p{N}\s])", r" $1 ")
    return F.size(F.filter(F.split(F.trim(spaced), r"\s+"), lambda x: x != "")).cast("int")


def char_count(col: Column) -> Column:
    return F.length(col).cast("int")


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are not letter/digit/space."""
    stripped = F.regexp_replace(col, r"[\p{L}\p{N}\s]", "")
    return F.when(F.length(col) > 0,
                  F.length(stripped) / F.length(col)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, stopwords: list[str] | None = None,
                   toks: Column | None = None) -> Column:
    """Fraction of tokens that are (lowercased) stopwords."""
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_EN)])
    toks = tokens(F.lower(col)) if toks is None else toks
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def mean_word_len(col: Column, toks: Column | None = None) -> Column:
    # word lengths are case-invariant: sharing lowered tokens is exact
    toks = tokens(col) if toks is None else toks
    n = F.size(toks)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(n > 0, total / n).otherwise(F.lit(0.0))


def quality_score(col: Column, toks: Column | None = None) -> Column:
    """Composite [0,1] quality heuristic: reasonable length, low punct
    ratio, some stopwords (prose-ness), sane mean word length. Each
    component clipped to [0,1]; score = mean of components.

    ``toks``: pre-computed LOWERCASED token array — pass one shared
    tokenization when combining with lang_id/token_count (tokenizing is
    the dominant cost and higher-order-function lambdas are excluded
    from Spark's subexpression elimination)."""
    n_tok = token_count(col, toks).cast("double")
    len_c = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    punct_c = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 4.0)
    stop_c = F.least(stopword_ratio(col, toks=toks) * 4.0, F.lit(1.0))
    mwl = mean_word_len(col, toks)
    mwl_c = F.when((mwl >= 2.0) & (mwl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return (len_c + punct_c + stop_c + mwl_c) / 4.0


def lang_id(col: Column, toks: Column | None = None) -> Column:
    """Marker-stopword language ID: score = count of tokens in each
    language's marker set; argmax wins; 'und' when all scores are 0.
    Ties break by language-key order (deterministic)."""
    toks = tokens(F.lower(col)) if toks is None else toks
    scores = []
    for lang in sorted(LANG_MARKERS):
        sw = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        score = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        scores.append(F.struct(score.alias("s"), F.lit(lang).alias("l")))
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    s["s"].alias("s"),
                    # invert language name so max() prefers the earlier
                    # alphabetical language at tied scores
                    F.lit(len(LANG_MARKERS) - i).alias("prio"),
                    s["l"].alias("l"),
                )
                for i, s in enumerate(scores)
            ]
        )
    )
    return F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und"))


def word_ngrams(toks: Column, n: int) -> Column:
    """Array of space-joined word ``n``-grams from a token array.
    Documents shorter than ``n`` tokens yield an empty array."""
    if n == 1:
        return toks
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>"))


def dup_ngram_frac(col: Column, n: int, toks: Column | None = None) -> Column:
    """Fraction of word-``n``-gram occurrences that are repeats of an
    earlier occurrence (Gopher-style repetition signal: ``1 -
    distinct/total``). 0.0 for documents with no ``n``-grams. Pure
    array expressions — no explode, no shuffle."""
    grams = word_ngrams(tokens(F.lower(col)) if toks is None else toks, n)
    total = F.size(grams)
    return F.when(
        total > 0,
        F.lit(1.0) - F.size(F.array_distinct(grams)) / total,
    ).otherwise(F.lit(0.0))


def top_ngram_frac(col: Column, n: int, toks: Column | None = None) -> Column:
    """Fraction of ``n``-gram occurrences taken by the single most
    frequent ``n``-gram (Gopher's top-n-gram coverage). O(d·g) nested
    scan over the per-document gram array — document-sized, never a
    shuffle."""
    grams = word_ngrams(tokens(F.lower(col)) if toks is None else toks, n)
    counts = F.transform(
        F.array_distinct(grams),
        lambda g: F.size(F.filter(grams, lambda x: x == g)),
    )
    return F.when(
        F.size(grams) > 0,
        F.array_max(counts) / F.size(grams),
    ).otherwise(F.lit(0.0))


def _lines(col: Column) -> Column:
    """Non-blank lines of a document (split on newline, trim-empty
    lines dropped — blank separators are layout, not content)."""
    return F.filter(F.split(col, "\n"), lambda l: F.trim(l) != "")


def dup_line_frac(col: Column) -> Column:
    """Fraction of non-blank lines that are duplicates of another line
    (``1 - distinct/total`` over exact line text)."""
    lines = _lines(col)
    total = F.size(lines)
    return F.when(
        total > 0,
        F.lit(1.0) - F.size(F.array_distinct(lines)) / total,
    ).otherwise(F.lit(0.0))


def dup_line_char_frac(col: Column) -> Column:
    """Fraction of line characters sitting in duplicated lines (every
    occurrence of a line that appears 2+ times counts). The Gopher
    filter thresholds on this to drop boilerplate-heavy pages."""
    lines = _lines(col)
    zero = F.lit(0).cast("long")
    clen = lambda acc, l: acc + F.length(l)  # noqa: E731
    dup = F.filter(
        lines, lambda l: F.size(F.filter(lines, lambda x: x == l)) > 1)
    all_chars = F.aggregate(lines, zero, clen)
    return F.when(
        all_chars > 0,
        F.aggregate(dup, zero, clen) / all_chars,
    ).otherwise(F.lit(0.0))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the canonicalized text (lowercased,
    whitespace-collapsed, sorted distinct tokens). Identical formula runs
    in DuckDB (`md5`) → oracle-checkable. The sorted-token canonical form
    makes it a bag-of-words fingerprint robust to token order."""
    toks = F.array_sort(F.array_distinct(tokens(F.lower(col))))
    return F.md5(F.array_join(toks, " ").cast("binary"))


def exact_fingerprint(col: Column) -> Column:
    """md5 of raw text (byte-exact duplicate detection)."""
    return F.md5(col.cast("binary"))


def rolling_fingerprint(col: Column, toks: Column | None = None) -> Column:
    """Order-SENSITIVE rolling document hash (Rabin-Karp flavor — the
    task spec's 'document fingerprinting (rolling hash)'): left-fold
    ``acc = (acc * 131 + token_hash) mod 2^31`` over the token stream.
    Unlike :func:`fingerprint` (bag-of-words, order-robust) this
    distinguishes permuted documents. Pure JVM expressions; identical
    arithmetic is DuckDB-exact (intermediates ≤ 39 bits), so the driver
    oracle reproduces it bit-for-bit."""
    from hipipe_spark.functions.hashing import _M, det_hash_str_i64
    toks = tokens(F.lower(col)) if toks is None else toks
    return F.aggregate(
        F.transform(toks, lambda t: det_hash_str_i64(t)),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 131 + h) % _M,
    ).cast("long")

# ---------------------------------------------------------------------------
# C4-style line heuristics (Raffel et al. 2020, §2.2 cleaning rules)
# ---------------------------------------------------------------------------


def terminal_line_frac(col: Column) -> Column:
    """Fraction of non-blank lines ending in a terminal punctuation mark
    (``. ! ? "``) — C4 keeps only such lines; pages with a low fraction
    are boilerplate-heavy. Pure array expressions over the line split."""
    lines = _lines(col)
    term = F.filter(
        lines,
        lambda l: F.trim(l).rlike(r'[.!?"]$'),
    )
    return F.when(F.size(lines) > 0,
                  F.size(term) / F.size(lines)).otherwise(F.lit(0.0))


def mean_words_per_line(col: Column) -> Column:
    """Mean whitespace-token count over non-blank lines (C4 drops lines
    under 3 words; the mean is the page-level screening signal)."""
    lines = _lines(col)
    zero = F.lit(0).cast("long")
    total = F.aggregate(
        lines, zero, lambda acc, l: acc + F.size(tokens(l)))
    return F.when(F.size(lines) > 0,
                  total / F.size(lines)).otherwise(F.lit(0.0))


def c4_flags(col: Column) -> dict[str, Column]:
    """The C4 page-level drop signals as named boolean columns:
    curly brace (code/templating), 'lorem ipsum' placeholder text, and
    the word 'javascript' (JS-disabled warnings). Case-insensitive
    substring checks — one JVM ``contains``/``lower`` pass each."""
    low = F.lower(col)
    return {
        "has_brace": col.contains("{"),
        "has_lorem": low.contains("lorem ipsum"),
        "has_javascript": low.contains("javascript"),
    }


def hashed_count_vector(col: Column, dim: int = 32, seed: int = 0,
                        toks: Column | None = None) -> Column:
    """Feature-hashing-trick count vector (Weinberger et al. 2009 /
    Vowpal Wabbit): every token hashes into one of ``dim`` buckets; the
    feature vector is the per-bucket token count, as ``array<int>``.

    Entirely scan-local — one shared tokenization, two nested HOF
    transforms, ZERO shuffle at any corpus size — and integer-exact:
    the det-hash family reproduces every bucket assignment bit-for-bit
    in DuckDB, so oracle compares need no float tolerance. Per-row cost
    is O(dim * n_tokens); intended for the bounded dims (16-256) linear
    probes and quality classifiers use, not for 2^20-bucket VW spaces
    (those want the explode + groupBy inverted layout instead)."""
    from hipipe_spark.functions.hashing import det_hash_str_i64

    if toks is None:
        toks = tokens(F.lower(col))
    buckets = F.transform(
        toks, _bucket_of(dim, seed, det_hash_str_i64))
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda b: F.size(F.filter(buckets, _eq_of(b))).cast("int"))


def _bucket_of(dim: int, seed: int, hash_fn):
    """Closure factory — NOT a default-arg lambda capture, which would
    give the HOF lambda arity 2 and bind the element INDEX."""
    def f(t):
        return F.pmod(hash_fn(t, seed), F.lit(dim)).cast("int")
    return f


def _eq_of(b):
    def f(x):
        return x == b
    return f


def dialogue_flags(col: Column) -> dict[str, Column]:
    """Dialogue-act / structure flags for a turn's text — the cheap
    per-turn signals an SFT filter or router reads: ``is_question``
    (trimmed text ends with '?'), ``has_code`` (fenced block marker),
    ``has_url``, ``n_lines``, ``ends_clean`` (terminal punctuation .!?
    — the C4 line rule at turn granularity). All contains/suffix
    predicates — no regex dialect to disagree with a SQL oracle, pure
    narrow-map JVM expressions."""
    t = F.trim(col)
    return {
        "is_question": t.endswith("?").cast("int"),
        "has_code": F.contains(col, F.lit("```")).cast("int"),
        "has_url": (F.contains(col, F.lit("http://"))
                    | F.contains(col, F.lit("https://"))).cast("int"),
        "n_lines": (F.size(F.split(col, "\n", -1))
                    .cast("int")),
        "ends_clean": (t.endswith(".") | t.endswith("!")
                       | t.endswith("?")).cast("int"),
    }


def compression_ratio(col: Column, level: int = 6) -> Column:
    """zlib-compressed-size / raw-size of the UTF-8 text — the
    Gopher/RefinedWeb-style redundancy signal (Rae et al. 2021 use the
    dual: highly compressible documents are repetitive boilerplate;
    nearly incompressible ones are noise/binary junk; natural prose
    sits in a mid band, typically ~0.3-0.6). Complements the exact
    n-gram repetition fractions above: compression catches long-range
    and approximate repetition that fixed-n counting misses.

    DEFLATE is not expressible in SQL, so unlike everything else in
    this module the implementation is an Arrow-vectorized
    ``pandas_udf`` (one Python call per BATCH, stdlib zlib in a tight
    loop — never per-row Spark-side) and the driver check for query
    registrations is rows-only; tests/test_round4_ops.py pins values
    against direct ``zlib.compress`` calls. Null/empty text -> null.

    Scale shape: a scan-local map — no shuffle, no state; at 100 TB it
    pipelines inside whatever stage scans the corpus. zlib level 6 is
    the cost/ratio knee (level 1 underestimates redundancy; 9 is ~2x
    slower for <1% ratio change).
    """
    # local import keeps module import light; the hint must be built
    # non-stringified (this module uses `from __future__ import
    # annotations`) so pyspark's signature inference sees pd.Series —
    # hence the explicit __annotations__ assignment.
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    lv = int(level)

    def _ratio_batch(s):
        import zlib

        def one(x):
            if x is None:
                return None
            b = x.encode("utf-8", errors="replace")
            if not b:
                return None
            return len(zlib.compress(b, lv)) / len(b)

        return s.map(one)

    _ratio_batch.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_ratio_batch, "double")(col)


def compressed_size(col: Column, level: int = 6) -> Column:
    """zlib-compressed byte length of the UTF-8 text (bigint) — the
    integer-exact companion to :func:`compression_ratio`, there so the
    DEFLATE path can carry a VALUE-checked driver row: byte counts
    compare bit-exactly across engines where the float ratio would
    need rounding discipline. Same Arrow-vectorized batch shape, same
    scan-local scale story. Null/empty text -> null."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    lv = int(level)

    def _size_batch(s):
        import zlib

        def one(x):
            if x is None:
                return None
            b = x.encode("utf-8", errors="replace")
            if not b:
                return None
            return len(zlib.compress(b, lv))

        return s.map(one)

    _size_batch.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_size_batch, "long")(col)


def readability(col: Column, round_to: int = 4) -> dict[str, Column]:
    """Classic readability indices as named columns — the quality-
    filtering companions to :func:`quality_score` (too-low grade level
    ≈ fragment soup, too-high ≈ OCR noise / legalese):

    - ``fre``  — Flesch Reading Ease:
      ``206.835 − 1.015·(W/S) − 84.6·(Y/W)``
    - ``fkgl`` — Flesch–Kincaid Grade Level:
      ``0.39·(W/S) + 11.8·(Y/W) − 15.59``
    - ``ari``  — Automated Readability Index:
      ``4.71·(C/W) + 0.5·(W/S) − 21.43``

    with W = whitespace words, S = sentence-terminator runs
    (``[.!?]+``, min 1), C = alphanumeric chars, Y = syllables by the
    vowel-group heuristic (total ``[aeiouy]+`` runs over the text,
    clamped below by W — a document-level simplification of the
    per-word min-1 rule; exact per-word clamping would need a
    per-token regex loop for a correction that moves FKGL by well
    under a grade on natural text). Every count is one JVM regex
    pass — no UDF, no shuffle;
    all three indices share the same three counts. Empty/whitespace
    text yields nulls (no words → undefined, not 0 — a 0 FKGL is a
    legitimate score).
    """
    low = F.lower(col)
    w = F.size(tokens(col)).cast("double")
    s = F.greatest(
        F.lit(1),
        F.size(F.regexp_extract_all(col, F.lit(r"[.!?]+"), 0))
    ).cast("double")
    y = F.greatest(
        w,
        F.size(F.regexp_extract_all(low, F.lit(r"[aeiouy]+"), 0))
         .cast("double"))
    c = F.length(F.regexp_replace(col, r"[^A-Za-z0-9]", "")) \
         .cast("double")
    wps, ypw, cpw = w / s, y / w, c / w
    guard = w > 0
    return {
        "fre": F.when(guard, F.round(
            F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * ypw,
            round_to)),
        "fkgl": F.when(guard, F.round(
            F.lit(0.39) * wps + F.lit(11.8) * ypw - F.lit(15.59),
            round_to)),
        "ari": F.when(guard, F.round(
            F.lit(4.71) * cpw + F.lit(0.5) * wps - F.lit(21.43),
            round_to)),
    }
