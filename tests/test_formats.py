"""CSV / JSON-lines landing seam: round trips, explicit schemas,
corrupt-row quarantine (sources/formats.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_mini_dw_spark.sources import formats
from etl_mini_dw_spark.sources.tables import typed_table


def _sample(spark, sf_dir):
    return typed_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )


DDL = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
    " o_totalprice decimal(14,2), o_orderdate timestamp_ntz"
)


def test_csv_round_trip(spark, sf_dir, tmp_path):
    src = _sample(spark, sf_dir)
    formats.write_csv(src, str(tmp_path / "csv"))
    back = formats.read_csv(spark, str(tmp_path / "csv"), DDL)
    assert back.schema == src.schema
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0


def test_jsonl_round_trip(spark, sf_dir, tmp_path):
    src = _sample(spark, sf_dir)
    formats.write_jsonl(src, str(tmp_path / "json"))
    back = formats.read_jsonl(spark, str(tmp_path / "json"), DDL)
    assert back.schema == src.schema
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0


def test_csv_corrupt_rows_quarantined(spark, tmp_path):
    p = tmp_path / "landing.csv"
    p.write_text("k,ts\n1,2024-01-01 00:00:00\nnot_a_number,also-not-a-ts\n2,2024-01-02 00:00:00\n")
    df = formats.read_csv(
        spark, str(p), "k bigint, ts timestamp_ntz", keep_corrupt=True
    ).cache()  # corrupt-record col cannot be queried straight off the scan
    good = df.filter(F.col(formats.CORRUPT_COL).isNull())
    bad = df.filter(F.col(formats.CORRUPT_COL).isNotNull())
    assert good.count() == 2
    assert bad.count() == 1
    # the original line survives for repair/alerting
    assert "not_a_number" in bad.first()[formats.CORRUPT_COL]


def test_orc_round_trip(spark, tmp_path):
    from etl_mini_dw_spark.sources import formats

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, None, None)],
        "id bigint, s string, v double",
    )
    p = str(tmp_path / "t.orc")
    formats.write_orc(df, p)
    back = formats.read_orc(spark, p)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_orc_predicate_pushdown_in_plan(spark, tmp_path):
    import contextlib, io

    from pyspark.sql import functions as F

    from etl_mini_dw_spark.sources import formats

    formats.write_orc(spark.range(1000).selectExpr("id", "id % 7 as k"), str(tmp_path / "t"))
    q = formats.read_orc(spark, str(tmp_path / "t")).filter(F.col("k") == 3).select("id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    s = buf.getvalue()
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,3)]" in s


def test_parquet_schema_evolution_merge(spark, tmp_path):
    from etl_mini_dw_spark.sources import formats

    v1 = str(tmp_path / "v1")
    v2 = str(tmp_path / "v2")
    spark.createDataFrame([(1, "a")], "id bigint, s string").write.parquet(v1)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, s string, score double"
    ).write.parquet(v2)
    got = formats.read_parquet_evolved(spark, v1, v2)
    assert set(got.columns) == {"id", "s", "score"}
    rows = {r["id"]: (r["s"], r["score"]) for r in got.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}
