"""Deduplication operators for large-scale training-data pipelines.

All fully distributed, Catalyst-expression based (no Python UDFs):

* exact         — hash-groupBy on content (rank-1 per identical text)
* minhash + LSH — word-shingle -> md5 minhash -> band -> bucket join
* n-gram Jaccard — exact set similarity for candidate verification
* simhash       — 16-bit md5-derived simhash

md5 (hex string) is the shared hash family because both Spark and the
DuckDB oracle compute identical digests — the lexicographic min of the
hex digest is a valid uniform min-hash, so the whole MinHash/LSH
pipeline replays in ANSI SQL for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

N_MINHASH = 4
SHINGLE_WORDS = 3
LSH_BANDS = 2  # 2 bands x 2 rows


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical row per identical text + duplicate count."""
    w = Window.partitionBy(text_col).orderBy(F.asc(id_col))
    wc = Window.partitionBy(text_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_dups", F.count(F.lit(1)).over(wc))
        .filter(F.col("_rn") == 1)
        .select(id_col, "n_dups")
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, shingle) rows: SHINGLE_WORDS-word shingles via lead()."""
    tok = df.select(
        id_col, F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w")
    ).filter(F.col("w") != "")
    win = Window.partitionBy(id_col).orderBy("pos")
    sh = tok.select(
        id_col,
        F.concat_ws(
            " ", "w", F.lead("w", 1).over(win), F.lead("w", 2).over(win)
        ).alias("shingle"),
        F.lead("w", 2).over(win).alias("_w2"),
    ).filter(F.col("_w2").isNotNull())
    return sh.select(id_col, "shingle")


def minhash_signature(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n_hashes: int = N_MINHASH,
) -> DataFrame:
    """(id, h0..h{n-1}) — per seed j: min(md5(j || '|' || shingle))."""
    sh = shingles(df, text_col, id_col)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("shingle")))).alias(f"h{j}")
        for j in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n_hashes: int = N_MINHASH, bands: int = LSH_BANDS,
) -> DataFrame:
    """MinHash-LSH near-dup candidates: docs sharing any band bucket.
    -> (doc_a, doc_b, sim_est) with doc_a < doc_b; sim_est = fraction
    of matching minhashes."""
    sig = minhash_signature(df, text_col, id_col, n_hashes)
    rows_per_band = n_hashes // bands
    band_cols = []
    for bnd in range(bands):
        hs = [F.col(f"h{bnd * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(bnd).alias("band"), F.md5(F.concat_ws("|", *hs)).alias("bucket"))
        )
    buckets = sig.select(
        id_col, *[f"h{j}" for j in range(n_hashes)],
        F.explode(F.array(*band_cols)).alias("bb"),
    ).select(id_col, *[f"h{j}" for j in range(n_hashes)], "bb.band", "bb.bucket")
    a = buckets.select(
        F.col(id_col).alias("doc_a"), "band", "bucket",
        *[F.col(f"h{j}").alias(f"ha{j}") for j in range(n_hashes)],
    )
    b = buckets.select(
        F.col(id_col).alias("doc_b"), "band", "bucket",
        *[F.col(f"h{j}").alias(f"hb{j}") for j in range(n_hashes)],
    )
    matches = (
        F.lit(0.0)
        + sum(
            F.when(F.col(f"ha{j}") == F.col(f"hb{j}"), 1.0).otherwise(0.0)
            for j in range(n_hashes)
        )
    ) / float(n_hashes)
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.round(matches, 6).alias("sim_est"))
        .distinct()
    )


def ngram_jaccard_adjacent(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact word-set Jaccard between consecutive ids (verification
    shape for near-dup candidates)."""
    toks = df.select(
        id_col,
        F.array_distinct(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("ws"),
    )
    a = toks.select(F.col(id_col).alias("doc_a"), F.col("ws").alias("wa"))
    b = toks.select((F.col(id_col) - 1).alias("doc_a"), F.col(id_col).alias("doc_b"),
                    F.col("ws").alias("wb"))
    return (
        a.join(b, "doc_a")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("wa", "wb"))
                / F.size(F.array_union("wa", "wb")),
                6,
            ).alias("jaccard"),
        )
    )


def simhash16(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash from the first 4 hex chars of each token's md5.

    bit value of hex char c at position p, bit b:
    ((strpos('0123456789abcdef', c) - 1) >> b) & 1; tokens vote +1/-1
    per bit; simhash = sum over set bits of 2^(4*p+b)."""
    tok = df.select(
        id_col, F.explode(F.filter(F.split(F.col(text_col), " "), lambda t: t != "")).alias("w")
    ).withColumn("hx", F.substring(F.md5("w"), 1, 4))
    pos = F.explode(F.sequence(F.lit(0), F.lit(15))).alias("bit")
    bits = tok.select(id_col, "hx", pos)
    hexval = F.conv(
        F.substring("hx", (F.col("bit") / 4).cast("int") + 1, 1), 16, 10
    ).cast("int")
    bitval = F.floor(hexval / F.pow(F.lit(2.0), (F.col("bit") % 4).cast("double"))).cast("long") % 2
    votes = bits.withColumn("vote", F.when(bitval == 1, 1).otherwise(-1))
    agg = votes.groupBy(id_col, "bit").agg(F.sum("vote").alias("v"))
    return (
        agg.withColumn(
            "contrib",
            F.when(F.col("v") >= 0, F.pow(F.lit(2.0), F.col("bit").cast("double")).cast("long")).otherwise(F.lit(0)),
        )
        .groupBy(id_col)
        .agg(F.sum("contrib").alias("simhash"))
    )
