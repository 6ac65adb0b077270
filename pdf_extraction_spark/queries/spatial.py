"""Global spatial join queries (J5/J6 shapes, SURVEY §2.3) with DuckDB
oracles.

Inside the pipeline these joins are page-local (both sides live in one
layout-UDF call); these queries exercise the *global* form — a bbox
theta-join across tables — over deterministic geometry synthesized
from the TPC-H-ish keys, so the driver's oracle gate covers the
operator itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .common import table as _table

# reference thresholds (structured_extract.py:191-214 / table_ocr.py:25)
V_THRESH = 120.0
OVERLAP_THRESH = 0.5
MAX_CHARS = 60
OVERLAP_WEIGHT = 10.0
TOLERANCE = 2.0


def _tables_geom(spark, sf_dir):
    """Synthetic table regions from part: deterministic bbox math."""
    p = _table(spark, sf_dir, "part")
    left = (F.col("p_partkey") % 40).cast("double") * 12.0
    width = ((F.col("p_size") % 20) + 8).cast("double") * 6.0
    top = ((F.col("p_partkey") % 50).cast("double")) * 14.0 + 100.0
    return p.select(
        F.col("p_partkey").alias("table_id"),
        left.alias("t_left"),
        (left + width).alias("t_right"),
        top.alias("t_top"),
        (top - 90.0).alias("t_bottom"),
    )


def _blocks_geom(spark, sf_dir):
    """Synthetic text blocks from customer rows."""
    c = _table(spark, sf_dir, "customer")
    left = (F.col("c_custkey") % 45).cast("double") * 11.0
    width = ((F.col("c_nationkey") % 15) + 6).cast("double") * 7.0
    bottom = ((F.col("c_custkey") % 55).cast("double")) * 13.0 + 105.0
    return c.select(
        F.col("c_custkey").alias("block_id"),
        F.col("c_name").alias("text"),
        left.alias("b_left"),
        (left + width).alias("b_right"),
        (bottom + 12.0).alias("b_top"),
        bottom.alias("b_bottom"),
    )


def q_spatial_title_join(spark, sf_dir):
    """J5 nearest-above title attach (structured_extract.py:180-214):
    for each table bbox pick the block with horizontal overlap >= 0.5,
    0 <= vertical gap <= 120, len(text) <= 60, minimizing
    gap - 10*overlap; deterministic tiebreak on block_id."""
    t = _tables_geom(spark, sf_dir)
    b = _blocks_geom(spark, sf_dir)
    ov_left = F.greatest("b_left", "t_left")
    ov_right = F.least("b_right", "t_right")
    overlap = (ov_right - ov_left) / F.least(
        F.greatest(F.col("b_right") - F.col("b_left"), F.lit(1e-3)),
        F.greatest(F.col("t_right") - F.col("t_left"), F.lit(1e-3)),
    )
    gap = F.col("b_bottom") - F.col("t_top")
    j = (
        t.join(
            b,
            (ov_right > ov_left)
            & (gap >= 0)
            & (gap <= V_THRESH)
            & (F.length("text") <= MAX_CHARS)
            & (F.length("text") > 0),
        )
        .withColumn("overlap", F.round(overlap, 9))
        .filter(F.col("overlap") >= OVERLAP_THRESH)
        .withColumn("score", F.round(gap - OVERLAP_WEIGHT * F.col("overlap"), 6))
    )
    w = Window.partitionBy("table_id").orderBy(F.asc("score"), F.asc("block_id"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("table_id", F.col("text").alias("title"), "score")
    )


SQL_SPATIAL_TITLE_JOIN = """
WITH t AS (
  SELECT p_partkey AS table_id,
         CAST(p_partkey % 40 AS DOUBLE) * 12.0 AS t_left,
         CAST(p_partkey % 40 AS DOUBLE) * 12.0 + (CAST(p_size % 20 AS DOUBLE) + 8) * 6.0 AS t_right,
         CAST(p_partkey % 50 AS DOUBLE) * 14.0 + 100.0 AS t_top,
         CAST(p_partkey % 50 AS DOUBLE) * 14.0 + 10.0 AS t_bottom
  FROM part),
b AS (
  SELECT c_custkey AS block_id, c_name AS text,
         CAST(c_custkey % 45 AS DOUBLE) * 11.0 AS b_left,
         CAST(c_custkey % 45 AS DOUBLE) * 11.0 + (CAST(c_nationkey % 15 AS DOUBLE) + 6) * 7.0 AS b_right,
         CAST(c_custkey % 55 AS DOUBLE) * 13.0 + 117.0 AS b_top,
         CAST(c_custkey % 55 AS DOUBLE) * 13.0 + 105.0 AS b_bottom
  FROM customer),
j AS (
  SELECT table_id, block_id, text,
         ROUND((LEAST(b_right, t_right) - GREATEST(b_left, t_left))
               / LEAST(GREATEST(b_right - b_left, 1e-3), GREATEST(t_right - t_left, 1e-3)), 9) AS overlap,
         b_bottom - t_top AS gap
  FROM t JOIN b
    ON LEAST(b_right, t_right) > GREATEST(b_left, t_left)
   AND b_bottom - t_top >= 0 AND b_bottom - t_top <= 120.0
   AND length(text) <= 60 AND length(text) > 0),
scored AS (
  SELECT table_id, block_id, text, ROUND(gap - 10.0 * overlap, 6) AS score
  FROM j WHERE overlap >= 0.5)
SELECT table_id, text AS title, score
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY table_id
                                   ORDER BY score ASC, block_id ASC) AS rn
      FROM scored)
WHERE rn = 1
"""


def q_spatial_containment(spark, sf_dir):
    """J6 point-in-rect containment join (table_ocr.py:161-203): word
    centers (from customer geometry) joined into table regions with
    tolerance 2.0; counts words per region."""
    t = _tables_geom(spark, sf_dir)
    b = _blocks_geom(spark, sf_dir)
    cx = (F.col("b_left") + F.col("b_right")) / 2.0
    cy = (F.col("b_bottom") + F.col("b_top")) / 2.0
    j = t.join(
        b,
        (cx >= F.col("t_left") - TOLERANCE)
        & (cx <= F.col("t_right") + TOLERANCE)
        & (cy >= F.col("t_bottom") - TOLERANCE)
        & (cy <= F.col("t_top") + TOLERANCE),
    )
    return j.groupBy("table_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.min("block_id").alias("first_block"),
    )


SQL_SPATIAL_CONTAINMENT = """
WITH t AS (
  SELECT p_partkey AS table_id,
         CAST(p_partkey % 40 AS DOUBLE) * 12.0 AS t_left,
         CAST(p_partkey % 40 AS DOUBLE) * 12.0 + (CAST(p_size % 20 AS DOUBLE) + 8) * 6.0 AS t_right,
         CAST(p_partkey % 50 AS DOUBLE) * 14.0 + 100.0 AS t_top,
         CAST(p_partkey % 50 AS DOUBLE) * 14.0 + 10.0 AS t_bottom
  FROM part),
b AS (
  SELECT c_custkey AS block_id,
         (CAST(c_custkey % 45 AS DOUBLE) * 11.0
          + CAST(c_custkey % 45 AS DOUBLE) * 11.0 + (CAST(c_nationkey % 15 AS DOUBLE) + 6) * 7.0) / 2.0 AS cx,
         (CAST(c_custkey % 55 AS DOUBLE) * 13.0 + 105.0
          + CAST(c_custkey % 55 AS DOUBLE) * 13.0 + 117.0) / 2.0 AS cy
  FROM customer)
SELECT table_id, COUNT(*) AS n_words, MIN(block_id) AS first_block
FROM t JOIN b
  ON cx >= t_left - 2.0 AND cx <= t_right + 2.0
 AND cy >= t_bottom - 2.0 AND cy <= t_top + 2.0
GROUP BY table_id
"""


QUERIES = {
    "spatial_title_join": q_spatial_title_join,
    "spatial_containment": q_spatial_containment,
}

ORACLE_SQL = {
    "spatial_title_join": SQL_SPATIAL_TITLE_JOIN,
    "spatial_containment": SQL_SPATIAL_CONTAINMENT,
}
