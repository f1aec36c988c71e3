"""Exception types for the lakehouse layer."""


class LakeError(Exception):
    """Base class for all lake errors."""


class TableNotFoundError(LakeError):
    """Referenced table does not exist in the lake catalog."""


class TableAlreadyExistsError(LakeError):
    """CREATE TABLE on an existing name without if_not_exists."""


class ConcurrentModificationError(LakeError):
    """Optimistic-concurrency conflict that could not be retried safely.

    Mirrors the reference's commit-retry contract: the PG metadata
    manager wraps commits in subtransactions and converts serialization
    failures into retryable TransactionExceptions
    (reference: src/pgducklake_metadata_manager.cpp:294-404). Appends
    retry transparently; conflicting rewrites of the same files raise.
    """


class ReadOnlyError(LakeError):
    """Write attempted against a read-only (attached/frozen) lake.

    Mirrors the reference FDW's DML block
    (reference: src/pgducklake_fdw.cpp:277-304).
    """


class SnapshotNotFoundError(LakeError):
    """Time travel to a version/timestamp with no snapshot."""


class AccessControlError(LakeError):
    """Operation not permitted for the session's role.

    Mirrors the reference's predefined-role model (ducklake_reader /
    ducklake_writer / ducklake_superuser; sql/pg_ducklake--0.1.0.sql and
    test/regression/sql/access_control.sql): writers run DML but DDL and
    maintenance require ownership.
    """
