"""PII detection / redaction for training corpora.

The standard pre-training scrub stage (documented in the C4, The Pile,
and FineWeb pipeline papers): regex families for emails, IPv4 addresses,
and phone-like digit runs, each replaced by a stable placeholder token so
downstream dedup/fingerprints stay deterministic. Everything is a JVM
``regexp_replace``/``regexp_count`` expression — no Python in the hot
path, and the patterns are deliberately RE2-compatible (no lookaround,
no backreferences) so the DuckDB oracle runs the byte-identical regex.

Relation to the reference: hipipe's conditional ``transform``
(`include/hipipe/core/stream/transform.hpp:222`) is the per-column
rewrite primitive these build on; the PII family itself is part of the
training-data extension surface (SURVEY.md §2.3), not §2.1 parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RE2-safe patterns (work identically in Java regex and DuckDB/RE2).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
# Phone-ish: international-prefix-optional digit run with separators,
# 9+ digits total — deliberately conservative (no lookaround in RE2, so
# precision comes from requiring the long digit run).
PHONE_RE = r"\+?[0-9](?:[0-9 ().-]{7,})[0-9]{2}"

PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (EMAIL_RE, "<EMAIL>"),
    "ipv4": (IPV4_RE, "<IP>"),
    "phone": (PHONE_RE, "<PHONE>"),
}


def pii_counts(col: Column, kinds: tuple[str, ...] = ("email", "ipv4")) -> dict[str, Column]:
    """Per-kind match counts (``regexp_count`` — one pass per kind,
    all JVM-side)."""
    return {k: F.regexp_count(col, F.lit(PII_PATTERNS[k][0])).alias(f"n_{k}")
            for k in kinds}


def scrub_pii(col: Column, kinds: tuple[str, ...] = ("email", "ipv4")) -> Column:
    """Replace each PII family with its placeholder token, applied in
    the declared order. Order matters only between overlapping families
    (emails are scrubbed before phone-ish digit runs can eat their
    digits), which is why ``kinds`` is an ordered tuple."""
    out = col
    for k in kinds:
        pat, token = PII_PATTERNS[k]
        out = F.regexp_replace(out, pat, token)
    return out
