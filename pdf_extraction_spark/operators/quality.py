"""Text-analysis operators for training-data pipelines: language-ID
(stopword heuristic), quality scoring, token counting, document
fingerprinting.  Pure Catalyst expressions — SQL-replayable."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .partitioning import ensure_parallelism

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "fr": ["le", "la", "de", "et", "les"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ein"],
}
ALL_STOPWORDS = sorted({w for ws in STOPWORDS.values() for w in ws})


def _tokens(text_col):
    return F.filter(F.split(F.col(text_col), " "), lambda t: t != "")


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID; ties/zero -> 'und' with lang-asc
    tiebreak (deterministic)."""
    tok = ensure_parallelism(df).select(
        id_col, F.explode(_tokens(text_col)).alias("w")
    )
    scores = []
    for lang in sorted(STOPWORDS):
        hits = F.sum(F.when(F.col("w").isin(STOPWORDS[lang]), 1).otherwise(0))
        scores.append(hits.alias(f"hits_{lang}"))
    agg = tok.groupBy(id_col).agg(*scores)
    best_hits = F.greatest(*[F.col(f"hits_{lang}") for lang in sorted(STOPWORDS)])
    pred = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        pred = F.when(
            (best_hits > 0) & (F.col(f"hits_{lang}") == best_hits), F.lit(lang)
        ).otherwise(pred)
    return agg.select(
        id_col, pred.alias("pred_lang"), best_hits.cast("long").alias("hits")
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / mean-word-length / stopword-ratio features + combined
    quality score (round 6)."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    stop_arr = F.array(*[F.lit(w) for w in ALL_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    mean_wl = (n_chars - (n_tokens - 1)) / n_tokens  # chars sans separators
    stop_ratio = n_stop / n_tokens
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
        + F.least(mean_wl / F.lit(8.0), F.lit(1.0)) * 0.2
    )
    return ensure_parallelism(df).select(
        id_col,
        n_tokens.cast("long").alias("n_tokens"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"),
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + regex word tokens + a BPE-ish subword
    estimate (ceil of chars/4 — the standard quick token estimator).

    re_tokens counts maximal [0-9A-Za-z_]+ runs via regexp_count —
    value-identical to the old split-on-separators + drop-empties form
    (verified 0 mismatches over sf1.0), but without materializing the
    token array: the split form allocated every substring and measured
    1.5s single-core / 3s on 32 cores (allocation-bound, slower when
    parallel); regexp_count reads 0.25-0.6s."""
    ws_tokens = F.size(_tokens(text_col))
    re_tokens = F.regexp_count(F.col(text_col), F.lit(r"[0-9A-Za-z_]+"))
    bpe_est = F.ceil(F.length(text_col) / F.lit(4.0))
    return ensure_parallelism(df).select(
        id_col,
        ws_tokens.cast("long").alias("ws_tokens"),
        re_tokens.cast("long").alias("re_tokens"),
        bpe_est.cast("long").alias("bpe_estimate"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: md5 of normalized text + min-shingle hash
    (1-permutation winnowing-style).

    Row-local (shingle array + array_min) — zero shuffle; the round-1
    posexplode + lead() window form shuffled and sorted every token.
    Docs with < 3 tokens get a null min_shingle_hash (parity with the
    old left join / the SQL oracle)."""
    from .dedup import shingle_array

    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    min_sh = F.array_min(F.transform(shingle_array(text_col), F.md5))
    return ensure_parallelism(df).select(
        id_col,
        F.md5(norm).alias("content_md5"),
        min_sh.alias("min_shingle_hash"),
    )
