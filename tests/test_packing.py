"""Sequence packing + chunking invariants (operators/packing.py)."""

from pyspark.sql import functions as F

from pg_ducklake_spark.operators.packing import chunk_documents, pack_sequences


def test_pack_sequences_invariants(spark):
    docs = spark.createDataFrame(
        [(i, (i * 37) % 900 + 1) for i in range(200)], "doc_id long, tok long"
    )
    packed = pack_sequences(
        docs, token_col="tok", max_tokens=1024, order_col="doc_id",
        id_cols=["doc_id"],
    ).collect()
    # every document's segments cover its full token count, in order
    per_doc = {}
    for r in packed:
        per_doc.setdefault(r.doc_id, []).append(r)
    total_tok = {r[0]: r[1] for r in docs.collect()}
    for d, segs in per_doc.items():
        segs.sort(key=lambda r: r.bin_id)
        assert sum(s.seg_tokens for s in segs) == total_tok[d]
        assert segs[0].doc_token_start == 0
    # every bin except the last is exactly full; none exceeds the budget
    bins = {}
    for r in packed:
        bins[r.bin_id] = bins.get(r.bin_id, 0) + r.seg_tokens
    last = max(bins)
    for b, n in bins.items():
        assert n == 1024 if b != last else n <= 1024
    # offsets tile each bin without gaps
    by_bin = {}
    for r in packed:
        by_bin.setdefault(r.bin_id, []).append((r.bin_offset, r.seg_tokens))
    for b, segs in by_bin.items():
        segs.sort()
        pos = 0
        for off, n in segs:
            assert off == pos
            pos += n


def test_pack_sequences_oversized_doc_spans_bins(spark):
    docs = spark.createDataFrame(
        [(1, 100), (2, 2500), (3, 50)], "doc_id long, tok long"
    )
    packed = pack_sequences(
        docs, token_col="tok", max_tokens=1024, order_col="doc_id",
        id_cols=["doc_id"],
    ).collect()
    segs2 = sorted(
        [r for r in packed if r.doc_id == 2], key=lambda r: r.bin_id
    )
    assert [s.seg_tokens for s in segs2] == [924, 1024, 552]
    assert [s.doc_token_start for s in segs2] == [0, 924, 1948]


def test_chunk_documents_reassembles(spark):
    text = "abcdefghij" * 30  # 300 chars
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = sorted(
        chunk_documents(df, chunk_chars=120, overlap=20).collect(),
        key=lambda r: r.chunk_no,
    )
    # starts advance by chunk-overlap; chunks cover the text
    assert [c.start for c in chunks] == [1, 101, 201]
    assert chunks[0].chunk == text[:120]
    assert chunks[1].chunk == text[100:220]
    assert chunks[-1].start + chunks[-1].chunk_len - 1 == len(text)
    # overlap region agrees between consecutive chunks
    assert chunks[0].chunk[-20:] == chunks[1].chunk[:20]
