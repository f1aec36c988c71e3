"""The py4j RPC-slimming patches (rpcslim.py) must be observationally
identical to stock PySpark: same Seq/List contents for every list
shape, same Column behavior, and the rebalance() probe memo must give
the same answer as a live probe.
"""

import os

from pyspark.sql import functions as F

from pg_ducklake_spark import rpcslim

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _seq_items(jseq):
    return [jseq.apply(i) for i in range(jseq.size())]


def test_batched_java_list_matches_stock(spark):
    sc = spark.sparkContext
    cases = [
        [],
        ["a"],
        ["a", "b", "c"],
        [1, 2, 3, 4, 5, 6, 7, 8, 9, 10],  # exactly one chunk
        [str(i) for i in range(11)],  # chunk boundary + 1
        [i for i in range(25)],  # multi-chunk ArrayList path
        ["x", None, "y"],  # None -> must fall back (returns None)
    ]
    for elems in cases:
        jlist = rpcslim._batched_java_list(sc, list(elems))
        if not elems or any(e is None for e in elems):
            assert jlist is None
            continue
        assert jlist.size() == len(elems)
        got = [jlist.get(i) for i in range(jlist.size())]
        assert got == elems

    # java Column objects ride through identically
    jcols = [F.col(c)._jc for c in ("a", "b", "c")]
    jlist = rpcslim._batched_java_list(sc, jcols)
    assert jlist.size() == 3
    assert [str(jlist.get(i)) for i in range(3)] == [str(j) for j in jcols]


def test_patched_to_seq_matches_stock(spark):
    from pyspark.sql.classic.column import _to_java_column, _to_seq

    sc = spark.sparkContext
    for n in (1, 2, 10, 11, 23):
        names = [f"c{i}" for i in range(n)]
        jseq = _to_seq(sc, names, _to_java_column)
        assert jseq.size() == n
        assert [str(c) for c in _seq_items(jseq)] == [
            str(_to_java_column(nm)) for nm in names
        ]


def test_patched_functions_still_work_end_to_end(spark):
    # F.<fn> via the fabricated static members + a wide select through
    # the batched _to_seq, executed — values prove the wire commands
    # are equivalent.
    df = spark.range(5).select(
        *[(F.col("id") + F.lit(i)).alias(f"v{i}") for i in range(13)]
    )
    rows = df.agg(*[F.sum(f"v{i}").alias(f"s{i}") for i in range(13)]).collect()
    assert [rows[0][f"s{i}"] for i in range(13)] == [10 + 5 * i for i in range(13)]
    # a fabricated member for a missing function still errors clearly
    import pyspark.sql.functions.builtin as b

    try:
        b._invoke_function("definitely_not_a_function_xyz", F.lit(1)._jc)
        raise AssertionError("expected a py4j error for a missing function")
    except AssertionError:
        raise
    except Exception:
        pass


def test_rebalance_probe_memo_matches_live_probe(spark):
    from pg_ducklake_spark.plans import _PROBE_CACHE, rebalance, t

    docs = t(spark, SF_DIR, "documents")
    assert getattr(docs, "_graft_probe", None) == (SF_DIR, "documents")
    before = dict(_PROBE_CACHE)
    out = rebalance(docs.select("doc_id", "text"), src=docs)
    mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    key = (spark.sparkContext.applicationId, (SF_DIR, "documents"), mpb)
    assert key in _PROBE_CACHE
    live = docs.select("doc_id", "text").rdd.getNumPartitions()
    assert _PROBE_CACHE[key] == live
    # second call hits the memo (no live probe): poison rdd access via
    # cache check — the cached value must be reused as-is
    _PROBE_CACHE[key] = live
    out2 = rebalance(docs.select("doc_id", "text"), src=docs)
    assert out2.schema == out.schema
    _PROBE_CACHE.clear()
    _PROBE_CACHE.update(before)


def test_rpc_counts_stay_slim(spark):
    """Pin the per-call RPC budget so a pyspark upgrade or a patch
    regression can't silently reinstate the 10x client chatter
    (pre-patch: F.col = 13 RPCs, 2-col select = 13). Counts are code-
    path-deterministic; bounds are generous to absorb minor drift."""
    import py4j.clientserver as cs

    df = spark.range(3)
    counts = {"n": 0}
    orig = cs.ClientServerConnection.send_command

    def counted(self, command):
        counts["n"] += 1
        return orig(self, command)

    cs.ClientServerConnection.send_command = counted
    try:
        F.col("x")  # warm member caches
        df.select("id", (F.col("id") + 1).alias("b"))
        counts["n"] = 0
        F.col("x")
        col_rpcs = counts["n"]
        counts["n"] = 0
        df.select("id", (F.col("id") + 1).alias("b"))
        select_rpcs = counts["n"]
    finally:
        cs.ClientServerConnection.send_command = orig
    assert col_rpcs <= 4, f"F.col cost {col_rpcs} RPCs (pre-patch: 13)"
    assert select_rpcs <= 12, (
        f"2-col select cost {select_rpcs} RPCs (pre-patch: ~25)"
    )


def test_dataframe_debugging_disabled_in_session(spark):
    assert (
        spark.conf.get("spark.python.sql.dataFrameDebugging.enabled", "true")
        == "false"
    )
