"""add_data_files (r7): register pre-written parquet into a table
without rewriting data — upstream DuckLake's ducklake_add_data_files;
neither the reference nor upstream-pg exposes it
(docs/ducklake_feature_coverage.md:97), divergence noted in PARITY.md."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pg_ducklake_spark.errors import LakeError


def _write(tmp_path, name, table):
    p = str(tmp_path / name)
    pq.write_table(table, p)
    return p


@pytest.fixture()
def ext(tmp_path):
    return _write(
        tmp_path,
        "ext1.parquet",
        pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "v": pa.array(["a", "b", "c"], pa.string())}),
    )


def test_register_without_rewrite(spark, lake, tmp_path, ext):
    ext2 = _write(
        tmp_path, "ext2.parquet",
        pa.table({"k": pa.array([4, 5], pa.int64()),
                  "v": pa.array(["d", "e"], pa.string())}),
    )
    lake.create_table("t", "k bigint, v string")
    n = lake.add_data_files("t", [ext, ext2])
    assert n == 5
    got = sorted((r.k, r.v) for r in lake.table("t").collect())
    assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")]
    # one snapshot, footer stats collected, source file untouched
    info = lake.table_info("t")
    assert info["file_count"] == 2
    assert os.path.exists(ext)
    st = lake._state("t")
    assert all(fe.stats.get("k", {}).get("min") is not None
               for fe in st.files.values())
    # stats-based pruning works on registered files
    from pg_ducklake_spark.operators.pruning import prune_files

    assert len(prune_files(st, "k >= 4")) == 1


def test_registered_rows_support_dml_and_rowid(spark, lake, ext):
    lake.create_table("t", "k bigint, v string")
    lake.add_data_files("t", [ext])
    ids = {r.k: r.rowid for r in lake.table("t", with_rowid=True).collect()}
    assert len(ids) == 3
    lake.delete("t", "k = 2")
    after = {r.k: r.rowid for r in lake.table("t", with_rowid=True).collect()}
    assert after == {k: v for k, v in ids.items() if k != 2}


def test_schema_mismatch_rejected(spark, lake, tmp_path):
    bad_cols = _write(
        tmp_path, "bad1.parquet",
        pa.table({"k": pa.array([1], pa.int64())}),
    )
    bad_type = _write(
        tmp_path, "bad2.parquet",
        pa.table({"k": pa.array([1], pa.int64()),
                  "v": pa.array([2.5], pa.float64())}),
    )
    lake.create_table("t", "k bigint, v string")
    with pytest.raises(LakeError, match="columns"):
        lake.add_data_files("t", [bad_cols])
    with pytest.raises(LakeError, match="not readable"):
        lake.add_data_files("t", [bad_type])
    assert lake.table("t").count() == 0  # nothing half-registered


def test_widening_upcast_accepted(spark, lake, tmp_path):
    narrow = _write(
        tmp_path, "narrow.parquet",
        pa.table({"k": pa.array([7], pa.int32()),
                  "v": pa.array(["x"], pa.string())}),
    )
    lake.create_table("t", "k bigint, v string")
    assert lake.add_data_files("t", [narrow]) == 1
    assert lake.table("t").collect()[0].k == 7


def test_not_null_violation_rejected_from_footer(spark, lake, tmp_path):
    withnull = _write(
        tmp_path, "n.parquet",
        pa.table({"k": pa.array([1, None], pa.int64()),
                  "v": pa.array(["a", "b"], pa.string())}),
    )
    lake.create_table("t", "k bigint NOT NULL, v string")
    with pytest.raises(LakeError, match="NOT NULL"):
        lake.add_data_files("t", [withnull])


def test_registered_files_survive_freeze_and_vacuum(spark, lake, tmp_path, ext):
    lake.create_table("t", "k bigint, v string")
    lake.add_data_files("t", [ext])
    lake.insert(
        "t", spark.createDataFrame([(9, "z")], "k bigint, v string")
    )
    out = str(tmp_path / "f.ducklake")
    lake.freeze(out)
    from pg_ducklake_spark import Lake

    frozen = Lake.attach_frozen(spark, out)
    assert frozen.table("t").count() == 4
    lake.vacuum("t")
    assert sorted(r.k for r in lake.table("t").collect()) == [1, 2, 3, 9]


def test_call_add_data_files_sql(spark, lake, ext):
    """CALL add_data_files through the SQL prompt routes to the Lake
    API and reports the registered row count."""
    lake.create_table("t", "k bigint, v string")
    n = lake.execute(f"CALL add_data_files('t', '{ext}')")
    assert n == 3
    assert lake.execute("SELECT count(*) AS n FROM t").collect()[0].n == 3


def test_add_data_files_in_transaction(spark, lake, ext, tmp_path):
    """Registration stages like any insert inside a transaction: one
    snapshot on commit, nothing visible before, nothing on rollback."""
    ext2 = _write(
        tmp_path, "ext3.parquet",
        pa.table({"k": pa.array([10], pa.int64()),
                  "v": pa.array(["t"], pa.string())}),
    )
    lake.create_table("t", "k bigint, v string")
    v0 = lake.current_snapshot("t")
    with lake.transaction():
        lake.add_data_files("t", [ext])
        lake.add_data_files("t", [ext2])
    assert lake.table("t").count() == 4
    assert lake.current_snapshot("t") == v0 + 1  # one snapshot for both
    try:
        with lake.transaction():
            lake.add_data_files("t", [ext2])
            raise RuntimeError("abort")
    except RuntimeError:
        pass
    assert lake.table("t").count() == 4  # rollback left nothing


def test_txn_operation_name_distinguishes_registration(
    spark, lake, ext, tmp_path
):
    """ADVICE r7: a staged registration commit must not be misreported
    as INSERT in the snapshot history — pure-registration transactions
    commit as ADD_DATA_FILES, mixed ones as INSERT+ADD_DATA_FILES."""
    lake.create_table("t", "k bigint, v string")
    with lake.transaction():
        lake.add_data_files("t", [ext])
    ops = {r.snapshot_id: r.operation for r in lake.snapshots("t").collect()}
    assert ops[lake.current_snapshot("t")] == "ADD_DATA_FILES"
    with lake.transaction():
        lake.insert(
            "t", spark.createDataFrame([(9, "z")], "k bigint, v string")
        )
        ext2 = _write(
            tmp_path, "ext4.parquet",
            pa.table({"k": pa.array([11], pa.int64()),
                      "v": pa.array(["u"], pa.string())}),
        )
        lake.add_data_files("t", [ext2])
    ops = {r.snapshot_id: r.operation for r in lake.snapshots("t").collect()}
    assert ops[lake.current_snapshot("t")] == "INSERT+ADD_DATA_FILES"
    assert lake.table("t").count() == 5


def test_nested_not_null_validated(spark, lake, tmp_path):
    """ADVICE r7: NOT NULL validation must reach nested columns —
    footer leaves are dotted paths (``a.list.element``), so the old
    top-level-only match silently passed files with NULL structs."""
    nested_null = _write(
        tmp_path, "nn.parquet",
        pa.table({
            "k": pa.array([1, 2], pa.int64()),
            "a": pa.array([[1, 2], None], pa.list_(pa.int64())),
        }),
    )
    nested_ok = _write(
        tmp_path, "nok.parquet",
        pa.table({
            "k": pa.array([1, 2], pa.int64()),
            # inner element null but the array itself is never NULL —
            # must be ACCEPTED (leaf stats are a maybe, resolved by a
            # column-pruned scan)
            "a": pa.array([[1, None], [3]], pa.list_(pa.int64())),
        }),
    )
    lake.create_table("t", "k bigint, a array<bigint> NOT NULL")
    with pytest.raises(LakeError, match="NOT NULL"):
        lake.add_data_files("t", [nested_null])
    assert lake.add_data_files("t", [nested_ok]) == 2
