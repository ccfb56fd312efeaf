"""Text analysis for training-data pipelines over the `documents` table:
language ID (stopword-ratio heuristic), quality scoring, token counting,
and rolling-hash document fingerprinting.

Everything except the fingerprint is pure JVM column math (split/regexp/
aggregate) — no Python in the hot path; the fingerprint uses a single
vectorized pandas UDF (polynomial rolling hash over codepoints).
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "es", "por"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"],
}


def tokens_col(text) -> object:
    """Whitespace tokenization (JVM-side)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens, n_chars_engine, avg token length — all codegen'd."""
    toks = tokens_col(text_col)
    return (
        df.withColumn("n_tokens", F.size(toks))
        .withColumn("n_chars_engine", F.length(text_col))
        .withColumn(
            "avg_token_len",
            F.round(
                (F.length(F.regexp_replace(text_col, r"\s+", ""))).cast("double")
                / F.greatest(F.size(toks), F.lit(1)),
                6,
            ),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features: punctuation / whitespace / uppercase
    ratios and a combined [0,1] score (length-normalized)."""
    n = F.greatest(F.length(text_col), F.lit(1)).cast("double")
    punct = F.length(F.regexp_replace(text_col, r"[^.,;:!?'\"()-]", "")) / n
    space = F.length(F.regexp_replace(text_col, r"[^ \t\n]", "")) / n
    upper = F.length(F.regexp_replace(text_col, r"[^A-Z]", "")) / n
    toks = F.size(tokens_col(text_col)).cast("double")
    score = (
        F.lit(1.0)
        - F.least(punct * 4, F.lit(0.5))
        - F.least(F.abs(space - F.lit(1.0 / 6.0)) * 2, F.lit(0.3))
        - F.least(upper * 2, F.lit(0.2))
    )
    return (
        df.withColumn("punct_ratio", F.round(punct, 6))
        .withColumn("space_ratio", F.round(space, 6))
        .withColumn("upper_ratio", F.round(upper, 6))
        .withColumn("n_words", toks.cast("long"))
        .withColumn("quality_score", F.round(score, 6))
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword-ratio language ID: picks the language whose
    stopword list matches the most tokens (JVM-side, no UDF)."""
    toks = tokens_col(text_col)
    scores = []
    for lang, words in _STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.sort_array(F.array(*scores), asc=False)[0]
    return df.withColumn(
        "lang_pred",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("unknown")),
    )


_FP_MOD = (1 << 61) - 1
_FP_BASE = 1_000_003


def _fp_batch(texts) -> np.ndarray:
    """Vectorized polynomial rolling hash (mod 2^61-1) over codepoints.

    Folds ALL docs in the batch simultaneously, one numpy step per char
    position, instead of a per-row per-character Python loop (O(total
    chars) interpreter work). The mulmod h*B mod M is exact in uint64 via
    the Mersenne-prime split: h = hi*2^32 + lo; hi*B reduced, then
    x*2^32 mod (2^61-1) = (x mod 2^29)<<32 + (x>>29); every intermediate
    stays < 2^63. Bit-identical to the scalar fingerprint_oracle."""
    n = len(texts)
    cps = [
        np.frombuffer((t or "").encode("utf-32-le"), dtype=np.uint32)
        for t in texts
    ]
    lens = np.fromiter((len(c) for c in cps), dtype=np.int64, count=n)
    out = np.zeros(n, dtype=np.int64)
    if n == 0 or lens.max(initial=0) == 0:
        return out
    M = np.uint64(_FP_MOD)
    B = np.uint64(_FP_BASE)
    u32 = np.uint64(32)
    u29 = np.uint64(29)
    lo_mask = np.uint64(0xFFFFFFFF)
    m29 = np.uint64((1 << 29) - 1)
    chunk = 2048
    for s in range(0, n, chunk):
        cl = lens[s : s + chunk]
        maxlen = int(cl.max())
        if maxlen == 0:
            continue
        mat = np.zeros((len(cl), maxlen), dtype=np.uint64)
        for i, c in enumerate(cps[s : s + chunk]):
            mat[i, : len(c)] = c
        h = np.zeros(len(cl), dtype=np.uint64)
        for pos in range(maxlen):
            hi = h >> u32
            lo = h & lo_mask
            t = (hi * B) % M
            t = ((t & m29) << u32) + (t >> u29)  # t*2^32 mod-ish, < 2^62
            h2 = (t + lo * B + mat[:, pos]) % M
            h = np.where(pos < cl, h2, h)
        out[s : s + chunk] = h.astype(np.int64) & 0x7FFFFFFFFFFFFFFF
    return out


@functools.lru_cache(maxsize=4)
def fingerprint_udf():
    """Polynomial rolling hash over codepoints -> int64 fingerprint."""

    @F.pandas_udf(LongType())
    def _f(text: pd.Series) -> pd.Series:
        return pd.Series(_fp_batch(text.tolist()))

    return _f


def fingerprint_oracle(texts) -> np.ndarray:
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        h = 0
        for ch in (t or ""):
            h = (h * _FP_BASE + ord(ch)) % _FP_MOD
        out[i] = h & 0x7FFFFFFFFFFFFFFF
    return out
