"""Graph analytics over the dup-pair graph: invariants the oracle
comparison can't see (the oracle proves Spark == DuckDB; these prove
both are computing a sensible graph)."""

from pg_ducklake_spark.plans import QUERIES


def test_triangle_census_invariants(spark, sf_dir):
    r = QUERIES["graph_triangle_census"](spark, sf_dir).collect()
    assert len(r) == 1
    row = r[0]
    # every edge touches 2 nodes; wedges >= triangles * 3 (each triangle
    # contributes exactly 3 closed wedges)
    assert row["n_nodes"] >= 2 or row["n_edges"] == 0
    assert row["n_wedges"] >= 3 * row["n_triangles"]
    assert 0.0 <= row["clustering_coeff"] <= 1.0


def test_degree_histogram_mass_matches_edges(spark, sf_dir):
    census = QUERIES["graph_triangle_census"](spark, sf_dir).collect()[0]
    hist = QUERIES["graph_degree_histogram"](spark, sf_dir).collect()
    # sum(degree * n_nodes) = 2 * |E| (handshake lemma), nodes add up
    assert sum(r["degree"] * r["n_nodes"] for r in hist) == 2 * census["n_edges"]
    assert sum(r["n_nodes"] for r in hist) == census["n_nodes"]
