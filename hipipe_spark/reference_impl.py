"""Single-node pandas/numpy oracle for the temporal feature pipeline.

Plays the role the reference's inline golden values play in its tests
(``test/core/stream/example.cpp:63-66``): an independent, obviously-
correct implementation the distributed engine must match via
``np.allclose`` per (conv_id, turn_idx, ts) — BASELINE.md "Feature
correctness" row. Deliberately written with per-group pandas idioms
(sort → groupby → shift/rolling/ffill/merge_asof), no Spark imports.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

ORDER = ["conv_id", "ts", "turn_idx"]


def _sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    return pdf.sort_values(ORDER, kind="mergesort").reset_index(drop=True)


def sessionize(pdf: pd.DataFrame, gap_sec: int = 1800) -> pd.DataFrame:
    pdf = _sorted(pdf)
    out = []
    for conv, g in pdf.groupby("conv_id", sort=False):
        gaps = g["ts"].diff().dt.total_seconds()
        new_sess = (gaps > gap_sec) | gaps.isna()
        seq = new_sess.cumsum() - 1
        g = g.assign(session_seq=seq.astype("int32"))
        g["session_id"] = conv + "#" + g["session_seq"].astype(str)
        out.append(g)
    return _sorted(pd.concat(out))


def featurize(pdf: pd.DataFrame, profiles: pd.DataFrame | None = None,
              gap_sec: int = 1800) -> pd.DataFrame:
    """Oracle for hipipe_spark.operators.flagship.featurize."""
    pdf = pdf.copy()
    pdf["text_len"] = pdf["text"].str.len().astype("int32")
    pdf = sessionize(pdf, gap_sec)
    feats = []
    for conv, g in pdf.groupby("conv_id", sort=False):
        g = g.copy()
        g["secs_since_prev"] = g["ts"].diff().dt.total_seconds()
        g["role_lag_1"] = g["role"].shift(1)
        g["role_lag_2"] = g["role"].shift(2)
        g["text_len_lag_1"] = g["text_len"].shift(1)
        is_assist = (g["role"] == "assistant").astype(float)
        # strictly-past rolling frames: rows [-10, -1]
        g["assistant_turns_10"] = (
            is_assist.rolling(10, min_periods=1).sum().shift(1)
        )
        g["mean_text_len_10"] = (
            g["text_len"].rolling(10, min_periods=1).mean().shift(1)
        )
        tool = g["tool"].where(g["tool"] != "", other=pd.NA)
        g["tool_filled"] = tool.ffill()
        feats.append(g)
    out = _sorted(pd.concat(feats))
    if profiles is not None:
        out = out.sort_values("ts", kind="mergesort")
        prof = profiles.sort_values("ts", kind="mergesort")
        merged = pd.merge_asof(
            out, prof, on="ts", by="conv_id", direction="backward",
            suffixes=("", "_asof"),
        )
        ren = {c: f"{c}_asof" for c in prof.columns
               if c not in ("conv_id", "ts") and f"{c}_asof" not in merged.columns}
        merged = merged.rename(columns=ren)
        out = _sorted(merged)
    return out


def asof_join(left: pd.DataFrame, right: pd.DataFrame, on: str = "ts",
              by: str = "conv_id", direction: str = "backward",
              allow_exact_matches: bool = True,
              tolerance_sec: int | None = None, suffix: str = "") -> pd.DataFrame:
    l = left.sort_values(on, kind="mergesort")
    r = right.sort_values(on, kind="mergesort")
    tol = pd.Timedelta(seconds=tolerance_sec) if tolerance_sec else None
    m = pd.merge_asof(l, r, on=on, by=by, direction=direction,
                      allow_exact_matches=allow_exact_matches, tolerance=tol,
                      suffixes=("", suffix or "_r"))
    return m


def allclose_frames(a: pd.DataFrame, b: pd.DataFrame, cols: list[str],
                    rtol: float = 1e-9, atol: float = 1e-9) -> bool:
    """Order both frames by ORDER and compare the given columns —
    numeric via np.allclose (NaN == NaN), other dtypes exactly."""
    a = a.sort_values(ORDER, kind="mergesort").reset_index(drop=True)
    b = b.sort_values(ORDER, kind="mergesort").reset_index(drop=True)
    if len(a) != len(b):
        return False
    for c in cols:
        x, y = a[c], b[c]
        if np.issubdtype(np.asarray(x.dropna()).dtype, np.number) or x.dtype.kind in "fiu":
            xv = pd.to_numeric(x, errors="coerce").to_numpy(dtype=float)
            yv = pd.to_numeric(y, errors="coerce").to_numpy(dtype=float)
            if not np.allclose(xv, yv, rtol=rtol, atol=atol, equal_nan=True):
                return False
        else:
            xa = x.fillna("\0NULL").astype(str).to_numpy()
            ya = y.fillna("\0NULL").astype(str).to_numpy()
            if not (xa == ya).all():
                return False
    return True


def bpe_reference(texts: list[str], k: int = 10, lowercase: bool = True,
                  min_count: int = 2) -> list[tuple[int, str, str, int]]:
    """Single-node BPE merge training (Sennrich et al. 2016, public):
    the exact convention pinned by operators/bpe.py — whitespace words,
    overlapping adjacent-pair counts weighted by word frequency, ties
    broken by lexicographically smallest (a, b), greedy left-to-right
    merge application. Used as the oracle for the distributed trainer
    (tests/test_bpe.py)."""
    from collections import Counter

    words = Counter()
    for t in texts:
        if lowercase:
            t = t.lower()
        for w in t.split():
            words[w] += 1
    vocab: dict[str, list[str]] = {w: list(w) for w in words}
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, k + 1):
        pairs: Counter = Counter()
        for w, cnt in words.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += cnt
        if not pairs:
            break
        (a, b), n = sorted(pairs.items(),
                           key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        if n < min_count:
            break
        merges.append((rank, a, b, n))
        for w, s in vocab.items():
            out: list[str] = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = out
    return merges


def bpe_segment_reference(text: str, merges: list[tuple[str, str]],
                          lowercase: bool = True) -> list[str]:
    """Apply merges in rank order to one text (greedy left-to-right per
    word, words concatenated) — oracle for operators/bpe.bpe_segment."""
    if lowercase:
        text = text.lower()
    out: list[str] = []
    for w in text.split():
        s = list(w)
        for a, b in merges:
            nxt: list[str] = []
            for x in s:
                if nxt and nxt[-1] == a and x == b:
                    nxt[-1] = a + b
                else:
                    nxt.append(x)
            s = nxt
        out.extend(s)
    return out
