"""Interleaved A/B probe of dedup_ngram_jaccard candidate-generation
variants (guide §1: measure in the shape the bench times).

Variants (all oracle-exact by construction):
  base  — committed shape: posting lists keyed on the shingle STRING.
  hkey  — posting lists keyed on xxhash64(shingle); the string rides in
          the entry; pairs require exact string equality (verify per
          group before pairing — collision-proof).
  twopass — posting lists keyed on xxhash64(shingle) with NO string
          anywhere in the shuffle; hash-candidate pairs (a superset:
          equal strings => equal hashes) are exactly re-verified by
          re-reading the docs of candidate pairs and computing
          size(array_intersect(shingles_a, shingles_b)).

Usage: python tools/probe_ngram_variants.py [draws]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pg_ducklake_spark.plans import t
from pg_ducklake_spark.plans.dedup import _spark_shingled
from pg_ducklake_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
THRESH = 0.6


def base(spark):
    shingled = _spark_shingled(t(spark, SF_DIR, "documents"))
    exploded = shingled.select(
        "doc_id",
        F.size("shingles").cast("long").alias("n"),
        F.explode_outer("shingles").alias("shingle"),
    ).filter(F.col("shingle").isNotNull())
    inter = (
        exploded.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "n"))).alias("dl"))
        .filter(F.size("dl") >= 2)
        .select(F.col("dl"), F.posexplode("dl").alias("i", "a"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.n").alias("na"),
            F.explode(F.expr("slice(dl, i + 2, size(dl))")).alias("b"),
        )
        .select("doc_a", "na", F.col("b.doc_id").alias("doc_b"), F.col("b.n").alias("nb"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    ).cast("double")
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= THRESH)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


def hkey(spark):
    shingled = _spark_shingled(t(spark, SF_DIR, "documents"))
    exploded = (
        shingled.select(
            "doc_id",
            F.size("shingles").cast("long").alias("n"),
            F.explode_outer("shingles").alias("shingle"),
        )
        .filter(F.col("shingle").isNotNull())
        .select(F.xxhash64("shingle").alias("h"), "shingle", "doc_id", "n")
    )
    inter = (
        exploded.groupBy("h")
        .agg(F.sort_array(F.collect_list(F.struct("shingle", "doc_id", "n"))).alias("dl"))
        .filter(F.size("dl") >= 2)
        .select(F.col("dl"), F.posexplode("dl").alias("i", "a"))
        .select(
            F.col("a.shingle").alias("sh_a"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.n").alias("na"),
            F.explode(F.expr("slice(dl, i + 2, size(dl))")).alias("b"),
        )
        .filter(F.col("sh_a") == F.col("b.shingle"))
        .select("doc_a", "na", F.col("b.doc_id").alias("doc_b"), F.col("b.n").alias("nb"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    ).cast("double")
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= THRESH)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


def twopass(spark):
    docs = t(spark, SF_DIR, "documents")
    shingled = _spark_shingled(docs)
    exploded = (
        shingled.select(
            "doc_id",
            F.size("shingles").cast("long").alias("n"),
            F.explode_outer("shingles").alias("shingle"),
        )
        .filter(F.col("shingle").isNotNull())
        .select(F.xxhash64("shingle").alias("h"), "doc_id", "n")
    )
    hinter = (
        exploded.groupBy("h")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "n"))).alias("dl"))
        .filter(F.size("dl") >= 2)
        .select(F.col("dl"), F.posexplode("dl").alias("i", "a"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.n").alias("na"),
            F.explode(F.expr("slice(dl, i + 2, size(dl))")).alias("b"),
        )
        .select("doc_a", "na", F.col("b.doc_id").alias("doc_b"), F.col("b.n").alias("nb"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("hinter"))
    )
    hjac = F.col("hinter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("hinter")
    ).cast("double")
    cand = (
        hinter.filter(hjac >= THRESH)
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    pairs_long = cand.select(
        F.struct("doc_a", "doc_b").alias("pid"),
        F.explode(
            F.array(
                F.struct(F.lit("a").alias("role"), F.col("doc_a").alias("id")),
                F.struct(F.lit("b").alias("role"), F.col("doc_b").alias("id")),
            )
        ).alias("side"),
    ).select("pid", "side.role", "side.id")
    attached = (
        _spark_shingled(docs)
        .join(pairs_long, F.col("doc_id") == F.col("id"))
        .select("pid", "role", "shingles")
    )
    agg = attached.groupBy("pid").agg(
        F.max(F.when(F.col("role") == "a", F.col("shingles"))).alias("sa"),
        F.max(F.when(F.col("role") == "b", F.col("shingles"))).alias("sb"),
    )
    out = agg.select(
        F.col("pid.doc_a").alias("doc_a"),
        F.col("pid.doc_b").alias("doc_b"),
        F.size(F.array_intersect("sa", "sb")).cast("long").alias("inter"),
        F.size("sa").cast("long").alias("na"),
        F.size("sb").cast("long").alias("nb"),
    )
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    ).cast("double")
    return (
        out.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= THRESH)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


VARIANTS = {"base": base, "hkey": hkey, "twopass": twopass}


def main() -> None:
    draws = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("probe_ngram")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    spark.sql("SELECT 1").collect()

    # correctness first: all variants must match base exactly
    ref = [tuple(r) for r in base(spark).collect()]
    for name, fn in VARIANTS.items():
        got = [tuple(r) for r in fn(spark).collect()]
        status = "OK" if got == ref else "MISMATCH"
        print(f"equal[{name}] = {status} ({len(got)} rows)", flush=True)
        if got != ref:
            return

    # job counts
    sc = spark.sparkContext
    for name, fn in VARIANTS.items():
        sc.setJobGroup(f"probe_{name}", name)
        fn(spark).collect()
        jobs = sc.statusTracker().getJobIdsForGroup(f"probe_{name}")
        sc.setJobGroup(None, None)
        print(f"jobs[{name}] = {len(jobs)}", flush=True)

    # warmup
    for _ in range(2):
        for fn in VARIANTS.values():
            fn(spark).collect()
    times = {n: [] for n in VARIANTS}
    for _ in range(draws):
        for name, fn in VARIANTS.items():
            t0 = time.time()
            df = fn(spark)
            df.collect()
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        ts = sorted(ts)
        med = ts[len(ts) // 2]
        print(f"{name:8s} median={med:.3f} draws={[round(x,3) for x in ts]}", flush=True)


if __name__ == "__main__":
    main()
