"""Driver-slot rotation must not drop correctness coverage: every query
retired from the 50-entry registry keeps its full Spark-vs-DuckDB
comparison here (same compare routine as tools/check_correctness —
rows + schema + order-insensitive exact values)."""

import duckdb
import pytest

from pdf_extraction_spark.queries import retired
from tools.check_correctness import TABLES, compare

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def test_retired_registry_shape():
    assert set(retired.QUERIES) == set(retired.ORACLE_SQL)
    assert set(retired.QUERIES) == {
        "normalized_prefixes", "chunk_fixed", "lsh_buckets",
        "topk_per_type", "window_hour_agg", "running_sum",
        "minmax_combined",
    }


@pytest.mark.parametrize("name", sorted(retired.QUERIES))
def test_retired_oracle(name, spark, duck):
    sdf = retired.QUERIES[name](spark, SF_DIR)
    ddf = duck.execute(retired.ORACLE_SQL[name]).df()
    problems = compare(name, sdf, ddf)
    assert not problems, problems
