"""Mirrors types.sql + docs/data_types.md: the §1.3 type matrix round
trips through parquet writes, the inline buffer (with its no-inline
tier), and the freeze/attach path."""

import datetime as dt
from decimal import Decimal

import pytest

from pg_ducklake_spark.errors import LakeError

SCALAR_DDL = (
    "b boolean, i8 tinyint, i16 smallint, i32 int, i64 bigint, "
    "f32 float, f64 double, dec decimal(12,3), hug decimal(38,0), "
    "s string, bin binary, d date, ts timestamp_ntz"
)

ROW = {
    "b": True,
    "i8": 7,
    "i16": -300,
    "i32": 2**31 - 1,
    "i64": -(2**62),
    "f32": 1.5,
    "f64": 2.25,
    "dec": Decimal("12345.678"),
    "hug": Decimal(2**100),
    "s": "héllo 世界",
    "bin": b"\x00\xffbytes",
    "d": dt.date(2001, 2, 3),
    "ts": dt.datetime(2024, 5, 6, 7, 8, 9, 123456),
}


def _assert_row(row):
    for k, v in ROW.items():
        got = getattr(row, k)
        if k == "bin":
            got = bytes(got)
        assert got == v, f"{k}: {got!r} != {v!r}"


def test_scalar_matrix_parquet_roundtrip(spark, lake):
    lake.create_table("t", SCALAR_DDL)
    df = spark.createDataFrame([ROW], lake._state("t").schema)
    lake.insert("t", df)
    _assert_row(lake.table("t").collect()[0])


def test_scalar_matrix_inline_roundtrip(spark, lake):
    """Native + text-converted tiers through the catalog-resident inline
    buffer (reference stores non-native types as text,
    src/pgducklake_direct_insert.cpp:848-888)."""
    lake.create_table("t", SCALAR_DDL, options={"data_inlining_row_limit": 10})
    lake.insert_rows("t", [dict(ROW)])
    assert lake.table_info("t")["inlined_rows"] == 1
    _assert_row(lake.table("t").collect()[0])
    lake.flush_inlined_data("t")
    _assert_row(lake.table("t").collect()[0])


def test_nested_types_parquet(spark, lake):
    lake.create_table(
        "t",
        "arr array<int>, st struct<x:int, y:string>, mp map<string,int>",
    )
    lake.insert(
        "t",
        spark.createDataFrame(
            [([1, 2, 3], (9, "n"), {"k": 5})],
            lake._state("t").schema,
        ),
    )
    row = lake.table("t").collect()[0]
    assert row.arr == [1, 2, 3] and row.st.x == 9 and row.mp == {"k": 5}


def test_nested_types_refuse_inline(spark, lake):
    """No-inline tier (docs/data_types.md:52-61): nested types bypass the
    buffer with a clear error instead of corrupting."""
    lake.create_table(
        "t", "st struct<x:int>", options={"data_inlining_row_limit": 10}
    )
    with pytest.raises((ValueError, LakeError)):
        lake.insert_rows("t", [{"st": (1,)}])


def test_array_of_floats_embedding_column(spark, lake):
    lake.create_table("emb", "vec_id bigint, embedding array<float>")
    lake.insert(
        "emb",
        spark.createDataFrame([(1, [0.1, 0.2]), (2, [0.3, 0.4])],
                              "vec_id bigint, embedding array<float>"),
    )
    rows = {r.vec_id: r.embedding for r in lake.table("emb").collect()}
    assert len(rows[1]) == 2


def test_variant_as_json_string(spark, lake):
    """variant.sql:5-30 analog: semi-structured values as JSON text +
    JSON functions (scalars, objects, arrays, nested)."""
    lake.create_table("t", "v string", options={"data_inlining_row_limit": 10})
    lake.insert_rows(
        "t",
        [
            {"v": "1"},
            {"v": '"str"'},
            {"v": '{"a": [1, 2, {"b": null}]}'},
            {"v": "[1, [2]]"},
        ],
    )
    got = lake.sql(
        "SELECT get_json_object(v, '$.a[2].b') AS b, v FROM t "
        "WHERE get_json_object(v, '$.a') IS NOT NULL"
    ).collect()
    assert len(got) == 1 and got[0].b is None


def test_types_survive_freeze(spark, lake, tmp_path):
    from pg_ducklake_spark import Lake

    lake.create_table("t", SCALAR_DDL)
    lake.insert("t", spark.createDataFrame([ROW], lake._state("t").schema))
    out = str(tmp_path / "m.ducklake")
    lake.freeze(out)
    _assert_row(Lake.attach_frozen(spark, out).table("t").collect()[0])


def test_csv_ingestion(spark, lake, tmp_path):
    """readme_examples.sql:24-26 — CTAS from read_csv with inference."""
    from pg_ducklake_spark.sources import ingest_csv

    p = tmp_path / "data.csv"
    p.write_text("id,name,score\n1,ann,9.5\n2,bob,7.25\n3,cid,\n")
    n = ingest_csv(lake, "people", str(p))
    assert n == 3
    df = lake.table("people")
    assert dict(df.dtypes)["id"] in ("int", "bigint")
    assert dict(df.dtypes)["score"] == "double"
    rows = {r.id: (r.name, r.score) for r in df.collect()}
    assert rows[1] == ("ann", 9.5) and rows[3][1] is None


def test_parquet_writer_options_honored(spark, lake):
    """A26 writer options flow to the parquet files: a small
    parquet_row_group_size_bytes yields multiple row groups, and
    parquet_compression selects the codec."""
    import glob
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    lake.create_table(
        "w",
        "a bigint, s string",
        options={"parquet_row_group_size_bytes": 64 * 1024,
                 "parquet_compression": "gzip"},
    )
    df = spark.range(200_000).select(
        F.col("id").alias("a"), F.md5(F.col("id").cast("string")).alias("s")
    ).coalesce(1)
    lake.insert("w", df)
    files = glob.glob(os.path.join(lake._table_dir("w"), "data", "**", "*.parquet"),
                      recursive=True)
    assert files
    meta = pq.ParquetFile(files[0]).metadata
    assert meta.num_row_groups > 1, "row-group size option ignored"
    assert meta.row_group(0).column(0).compression.lower() == "gzip"
    assert lake.table("w").count() == 200_000


def test_csv_ingestion_over_http(spark, lake, tmp_path):
    """The reference ingests CSVs straight from https URLs
    (readme_examples.sql:24-26, README.md:108-110); url sources are
    spooled driver-side then parsed distributed."""
    import http.server
    import threading
    from pg_ducklake_spark.sources import ingest_csv

    (tmp_path / "remote.csv").write_text("a,b\n1,x\n2,y\n")
    handler = lambda *args: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *args, directory=str(tmp_path)
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/remote.csv"
        n = ingest_csv(lake, "remote", url)
        assert n == 2
        assert {r.a: r.b for r in lake.table("remote").collect()} == {1: "x", 2: "y"}
    finally:
        srv.shutdown()


# ---------------------------------------------------------------------------
# types.sql:16-31 native tier (TIME / TIMETZ / INTERVAL / UUID) and
# :77-81 text-inline tier (TIMESTAMP / TIMESTAMPTZ), mapped Spark-first:
# TIME -> TimeType (4.x, spark.sql.timeType.enabled), INTERVAL ->
# DayTimeIntervalType (parquet-native), TIMESTAMPTZ -> TimestampType
# (instant semantics), UUID/TIMETZ -> text tier (no Spark analog; the
# reference itself stores non-native types as text,
# src/pgducklake_direct_insert.cpp:848-888).
# ---------------------------------------------------------------------------

TEMPORAL_DDL = (
    "t time, ttz timetz, iv interval, u uuid, tstz timestamptz"
)

TEMPORAL_ROW = {
    "t": dt.time(12, 30, 0),
    "ttz": "12:30:00+05:30",
    "iv": dt.timedelta(days=1, minutes=30),
    "u": "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11",
    "tstz": dt.datetime(2024, 6, 15, 12, 30, 0),  # UTC session
}


def _assert_temporal(row):
    for k, v in TEMPORAL_ROW.items():
        assert getattr(row, k) == v, f"{k}: {getattr(row, k)!r} != {v!r}"


def test_temporal_ddl_spellings(lake):
    lake.create_table("t", TEMPORAL_DDL)
    got = dict(lake.table("t").dtypes)
    assert got["t"].startswith("time")
    assert got["ttz"] == "string"
    assert got["iv"].startswith("interval day")
    assert got["u"] == "string"
    assert got["tstz"] == "timestamp"


def test_temporal_matrix_parquet_roundtrip(spark, lake):
    lake.create_table("t", TEMPORAL_DDL)
    df = spark.createDataFrame([TEMPORAL_ROW], lake._state("t").schema)
    lake.insert("t", df)
    _assert_temporal(lake.table("t").collect()[0])


def test_temporal_matrix_inline_roundtrip(lake):
    lake.create_table(
        "t", TEMPORAL_DDL, options={"data_inlining_row_limit": 10}
    )
    lake.insert_rows("t", [dict(TEMPORAL_ROW)])
    assert lake.table_info("t")["inlined_rows"] == 1
    _assert_temporal(lake.table("t").collect()[0])
    lake.flush_inlined_data("t")
    assert lake.table_info("t")["inlined_rows"] == 0
    _assert_temporal(lake.table("t").collect()[0])


def test_temporal_matrix_survives_freeze(spark, lake, tmp_path):
    from pg_ducklake_spark import Lake

    lake.create_table("t", TEMPORAL_DDL)
    lake.insert(
        "t", spark.createDataFrame([TEMPORAL_ROW], lake._state("t").schema)
    )
    # plus one inline row so the frozen file carries both storage tiers
    lake.set_option("data_inlining_row_limit", 10, table="t")
    lake.insert_rows("t", [dict(TEMPORAL_ROW)])
    out = str(tmp_path / "m.ducklake")
    lake.freeze(out)
    rows = Lake.attach_frozen(spark, out).table("t").collect()
    assert len(rows) == 2
    for r in rows:
        _assert_temporal(r)


def test_interval_filter_and_arithmetic(lake, spark):
    """Interval columns participate in predicates and arithmetic —
    the tier is usable, not just storable."""
    lake.create_table("t", "id int, iv interval")
    lake.insert(
        "t",
        spark.createDataFrame(
            [(1, dt.timedelta(minutes=5)), (2, dt.timedelta(hours=3))],
            lake._state("t").schema,
        ),
    )
    got = lake.sql(
        "SELECT id FROM t WHERE iv > INTERVAL '1' HOUR"
    ).collect()
    assert [r.id for r in got] == [2]
    tot = lake.sql("SELECT sum(iv) AS s FROM t").collect()[0].s
    assert tot == dt.timedelta(hours=3, minutes=5)


def test_extended_ddl_spellings(lake):
    """docs/data_types.md full matrix: PG/DuckDB spellings the Spark DDL
    parser rejects map to their documented tiers (types.sql:4-31,
    metadata_sync.sql double precision)."""
    lake.create_table(
        "sp",
        "cv character varying(20), cv2 character varying, dp double precision,"
        " u1 utinyint, u2 usmallint, u4 uinteger, u8 ubigint,"
        " h hugeint, uh uhugeint, j json, n numeric(10,2),"
        " ts_s timestamp_s, ts_ns timestamp_ns, geo point, shape polygon",
    )
    got = dict(lake.table("sp").dtypes)
    assert got["cv"] == "string" and got["cv2"] == "string"
    assert got["dp"] == "double"
    assert (got["u1"], got["u2"], got["u4"]) == ("smallint", "int", "bigint")
    assert got["u8"] == "decimal(38,0)"
    assert got["h"] == "string" and got["uh"] == "string"
    assert got["j"] == "string"
    assert got["n"] == "decimal(10,2)"
    assert got["ts_s"].startswith("timestamp")
    assert got["ts_ns"] == "string"
    assert got["geo"] == "string" and got["shape"] == "string"
    # round trip one row through the parquet tier
    from decimal import Decimal
    from pyspark.sql import Row

    lake.insert(
        "sp",
        lake.spark.createDataFrame(
            [Row(cv="x", cv2="y", dp=1.5, u1=200, u2=40000, u4=3_000_000_000,
                 u8=Decimal(2**64 - 1), h=str(2**100), uh=str(2**127),
                 j='{"a": 1}', n=Decimal("12.34"),
                 ts_s=__import__("datetime").datetime(2024, 1, 2, 3, 4, 5),
                 ts_ns="2024-01-02 03:04:05.123456789",
                 geo="POINT(1 2)", shape="POLYGON((0 0,1 0,1 1,0 0))")],
            lake._state("sp").schema,
        ),
    )
    row = lake.table("sp").collect()[0]
    assert row.u8 == Decimal(2**64 - 1) and row.h == str(2**100)
    assert row.geo == "POINT(1 2)"


def test_reserved_spelling_as_column_name(lake):
    """ADVICE r6: the fallback spellings must apply in TYPE position
    only — a column NAMED json/point/hugeint keeps its name even when
    another column forces the fallback parse path."""
    lake.create_table(
        "rsv",
        "point json, json hugeint, polygon double precision, interval json",
    )
    got = dict(lake.table("rsv").dtypes)
    assert set(got) == {"point", "json", "polygon", "interval"}
    assert got["point"] == "string"    # json tier
    assert got["json"] == "string"     # hugeint tier
    assert got["polygon"] == "double"
    assert got["interval"] == "string"


def test_bare_timestamp_is_ntz(spark, lake):
    """DuckDB/PG bare TIMESTAMP is WITHOUT time zone
    (docs/data_types.md:27): the lake must map it to timestamp_ntz —
    Spark's native parse reads the same spelling as TIMESTAMP_LTZ,
    which made TIMESTAMP and TIMESTAMPTZ indistinguishable and shifted
    wall-clock values under non-UTC session timezones (DST-gap values
    silently moved). TIMESTAMPTZ stays the instant type."""
    from pg_ducklake_spark.sqlexec import execute

    execute(lake, "CREATE TABLE ts_kinds (ts TIMESTAMP, tz TIMESTAMPTZ)")
    sch = {f.name: f.dataType.simpleString() for f in lake.table("ts_kinds").schema}
    assert sch == {"ts": "timestamp_ntz", "tz": "timestamp"}
    # literal keyword rewrites to the NTZ literal form (value taken
    # verbatim, never re-interpreted through the session zone); the
    # 02:30 below sits inside the America/New_York DST gap — the
    # regression case that exposed the LTZ mapping.
    execute(
        lake,
        "INSERT INTO ts_kinds VALUES (TIMESTAMP '2024-03-10 02:30:00',"
        " TIMESTAMPTZ '2024-01-15 12:00:00')",
    )
    row = lake.sql("SELECT * FROM ts_kinds").collect()[0]
    assert row.ts.isoformat() == "2024-03-10T02:30:00"
    assert lake.sql(
        "SELECT count(*) AS n FROM ts_kinds"
        " WHERE ts = TIMESTAMP '2024-03-10 02:30:00'"
    ).collect()[0].n == 1


def test_timestamp_literal_rewrite_is_quote_aware():
    from pg_ducklake_spark.pgsyntax import rewrite

    out = rewrite("SELECT TIMESTAMP '2024-01-01 00:00:00' AS t")
    assert "TIMESTAMP_NTZ '2024-01-01" in out
    out2 = rewrite("SELECT TIMESTAMPTZ '2024-01-01 00:00:00' AS t")
    assert "TIMESTAMP '2024-01-01" in out2 and "TIMESTAMPTZ" not in out2
    # inside string literals and for plain identifiers: untouched
    keep = rewrite("SELECT 'TIMESTAMP ''2024'' here', ts AS timestamp FROM x")
    assert "TIMESTAMP ''2024''" in keep and "AS timestamp" in keep
    # CAST targets are not literals and pass through
    assert "AS TIMESTAMP)" in rewrite("SELECT CAST(x AS TIMESTAMP) FROM t")


def test_timestamp_literal_no_space_form():
    """ADVICE r9: PG/DuckDB accept TIMESTAMP'...' with NO space before
    the quote; unrewritten, Spark parses it as TIMESTAMP_LTZ — the
    same DST-gap wall-clock-shift class the spaced form was fixed
    for."""
    from pg_ducklake_spark.pgsyntax import rewrite

    out = rewrite("SELECT TIMESTAMP'2024-03-10 02:30:00' AS t")
    assert "TIMESTAMP_NTZ '2024-03-10" in out
    out2 = rewrite("SELECT TIMESTAMPTZ'2024-01-15 12:00:00' AS t")
    assert "TIMESTAMP '2024-01-15" in out2 and "TIMESTAMPTZ" not in out2


def test_nested_struct_field_named_timestamp(lake):
    """ADVICE r9: the unconditional TIMESTAMP->NTZ type rewrite must
    not rename a nested struct FIELD named timestamp — only type
    positions. 's struct<timestamp: int>' keeps its field name; a
    nested timestamp TYPE still maps to NTZ."""
    lake.create_table(
        "nst", "s struct<timestamp: int, at: timestamp>, ts timestamp"
    )
    sch = lake.table("nst").schema
    inner = {f.name: f.dataType.simpleString() for f in sch["s"].dataType}
    assert inner == {"timestamp": "int", "at": "timestamp_ntz"}
    assert sch["ts"].dataType.simpleString() == "timestamp_ntz"


def test_nested_struct_field_named_timestamp_colonless(lake):
    """ADVICE r10: Spark DDL also accepts the colon-LESS struct field
    form, and the (?!\\s*:) guard missed it — 'struct<timestamp int>'
    silently renamed the field to TIMESTAMP_NTZ. Type positions (field
    type, array element, NOT NULL-suffixed top-level) must still map."""
    lake.create_table(
        "nstc",
        "s struct<timestamp int, at timestamp>, "
        "arr array<timestamp>, ts timestamp not null",
    )
    sch = lake.table("nstc").schema
    inner = {f.name: f.dataType.simpleString() for f in sch["s"].dataType}
    assert inner == {"timestamp": "int", "at": "timestamp_ntz"}
    assert sch["arr"].dataType.simpleString() == "array<timestamp_ntz>"
    assert sch["ts"].dataType.simpleString() == "timestamp_ntz"
    assert sch["ts"].nullable is False
