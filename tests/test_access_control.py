"""A27 role model — reference test/regression/sql/access_control.sql.

The reference ships predefined roles (ducklake_superuser /
ducklake_writer / ducklake_reader, sql/pg_ducklake--0.1.0.sql) and its
regression test pins: DDL ownership is enforced (ALTER/DROP fail for a
writer, access_control.sql §2), VACUUM requires ownership (§3), and DML
for readers is a documented known gap ("should fail but doesn't", §4).
This engine implements the *intended* semantics: reader = SELECT only,
writer = +DML, admin = +DDL/maintenance.
"""

import pytest

from pg_ducklake_spark import AccessControlError, Lake, ReadOnlyError
from pg_ducklake_spark.errors import LakeError


@pytest.fixture()
def acl_lake(spark, tmp_path):
    """Admin-created lake with one table, as in access_control.sql setup."""
    lake = Lake(spark, str(tmp_path / "lake"))
    lake.create_table("acl_test", "id int, name string, secret string")
    lake.insert_rows(
        "acl_test",
        [{"id": 1, "name": "Alice", "secret": "pw1"},
         {"id": 2, "name": "Bob", "secret": "pw2"}],
    )
    return lake


def test_admin_full_dml(acl_lake, spark, tmp_path):
    """§1: full-access role — all DML works."""
    admin = Lake.attach(spark, acl_lake.path, role="admin")
    admin.insert_rows("acl_test", [{"id": 3, "name": "Carol", "secret": "pw3"}])
    admin.update("acl_test", {"name": "'Updated'"}, "id = 3")
    admin.delete("acl_test", "id = 3")
    assert admin.table("acl_test").count() == 2


def test_writer_dml_allowed_ddl_rejected(acl_lake, spark):
    """§2: writer runs DML; ALTER/DROP/VACUUM need ownership."""
    writer = Lake.attach(spark, acl_lake.path, role="writer")
    assert writer.role == "writer"
    writer.insert_rows("acl_test", [{"id": 3, "name": "Carol", "secret": "x"}])
    assert writer.update("acl_test", {"name": "'Up'"}, "id = 3") == 1
    assert writer.delete("acl_test", "id = 3") == 1
    for fn in (
        lambda: writer.add_column("acl_test", "extra", "int"),
        lambda: writer.drop_table("acl_test"),
        lambda: writer.vacuum("acl_test"),
        lambda: writer.create_table("t2", "a int"),
        lambda: writer.set_option("data_inlining_row_limit", 5),
        lambda: writer.expire_snapshots("acl_test", keep_last=1),
    ):
        with pytest.raises(AccessControlError):
            fn()
    # the writer's DML didn't corrupt anything for the owner
    assert acl_lake.table("acl_test").count() == 2


def test_reader_select_only(acl_lake, spark):
    """§4 intended semantics: reader SELECTs; every write path fails."""
    reader = Lake.attach(spark, acl_lake.path, role="reader")
    assert reader.read_only and reader.role == "reader"
    assert reader.table("acl_test").count() == 2
    with pytest.raises(ReadOnlyError):
        reader.insert_rows("acl_test", [{"id": 9, "name": "G", "secret": "x"}])
    with pytest.raises(ReadOnlyError):
        reader.delete("acl_test", "id = 1")
    with pytest.raises(ReadOnlyError):
        reader.add_column("acl_test", "extra", "int")


def test_reader_time_travel_allowed(acl_lake, spark):
    """§7: time_travel is a read — allowed for any role."""
    reader = Lake.attach(spark, acl_lake.path, role="reader")
    v = acl_lake.current_snapshot("acl_test")
    assert reader.time_travel("acl_test", v).count() == 2


def test_unknown_role_rejected(spark, tmp_path):
    with pytest.raises(LakeError):
        Lake(spark, str(tmp_path / "x"), role="root")


def test_read_only_implies_reader(acl_lake, spark):
    legacy = Lake.attach(spark, acl_lake.path, read_only=True)
    assert legacy.role == "reader"
    rw = Lake.attach(spark, acl_lake.path, read_only=False)
    assert rw.role == "admin"
    rw.vacuum("acl_test")


def test_configurable_role_names(spark, tmp_path):
    """ducklake.superuser_role/writer_role/reader_role GUC analog
    (src/pgducklake_guc.cpp:57-74): deployments rename the three
    predefined roles; tier semantics are unchanged."""
    custom = {"admin": "lake_root", "writer": "etl", "reader": "analyst"}
    lake = Lake(spark, str(tmp_path / "rn"), role="lake_root", role_names=custom)
    assert lake.role == "admin" and lake.role_names["reader"] == "analyst"
    lake.create_table("t", "id int")
    ro = Lake(spark, lake.path, create=False, role="analyst", role_names=custom)
    assert ro.role == "reader" and ro.read_only
    # canonical tier names still resolve, unknown names do not
    assert Lake(spark, lake.path, create=False, role="writer",
                role_names=custom).role == "writer"
    with pytest.raises(LakeError, match="unknown role"):
        Lake(spark, lake.path, create=False, role="admin2", role_names=custom)
    with pytest.raises(LakeError, match="unknown role tiers"):
        Lake(spark, lake.path, create=False, role_names={"boss": "x"})
