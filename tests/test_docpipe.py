"""Doc-pipeline Spark ops vs DuckDB oracles (in-process, sf0.001) — the
same comparison the round driver runs, kept here so `pytest` alone
demonstrates the oracle strategy."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.execute(f"CREATE TABLE {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


def _compare(spark, duck, fn, sql):
    sys.path.insert(0, "/root/repo")
    from tools.check_oracles import compare

    got = fn(spark, SF).toPandas()
    want = duck.execute(sql).fetchdf()
    ok, msg = compare(got, want)
    assert ok, msg


@pytest.mark.parametrize(
    "name",
    ["token_stats", "quality_score", "lang_id", "dedup_exact", "simhash", "cosine_topk"],
)
def test_docpipe_matches_duckdb(spark, duck, name):
    from geminigraph_spark.functions import docpipe as D
    from geminigraph_spark.functions import sql_oracles_docs as SD

    fn = getattr(D, name if name != "cosine_topk" else "cosine_topk")
    sql = getattr(SD, f"{name}_sql")()
    _compare(spark, duck, fn, sql)


def test_graph_query_matches_duckdb(spark, duck):
    import __spark_entry__ as E

    _compare(spark, duck, E.queries()["degrees"], E.oracle_sql()["degrees"])
