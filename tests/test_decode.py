"""Span decoding + span-sequence invariant tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from mkgmap_spark.operators.decode import decode_documents, span_sequence_fingerprint


def test_decode_kinds(spark, documents_df):
    feats = decode_documents(documents_df)
    kinds = {r["kind"] for r in feats.select("kind").distinct().collect()}
    assert {"node", "way", "relation"} <= kinds
    # nodes have exactly one coord
    bad = feats.filter((F.col("kind") == "node") & (F.size("lats") != 1)).count()
    assert bad == 0
    # ways have >= 2 coords
    bad = feats.filter((F.col("kind") == "way") & (F.size("lats") < 2)).count()
    assert bad == 0


def test_decode_closed_flag(spark, documents_df):
    feats = decode_documents(documents_df)
    closed = feats.filter(F.col("closed"))
    n = closed.count()
    assert n > 0
    mismatch = closed.filter(
        (F.try_element_at("lats", F.lit(1)) != F.try_element_at("lats", F.lit(-1)))
        | (F.try_element_at("lons", F.lit(1)) != F.try_element_at("lons", F.lit(-1)))
    ).count()
    assert mismatch == 0


def test_decode_tags_and_members(spark, documents_df):
    feats = decode_documents(documents_df)
    rel = feats.filter(F.col("kind") == "relation")
    assert rel.count() > 0
    assert rel.filter(F.size("members") == 0).count() == 0
    # member refs resolve to existing ids (relation->member join,
    # ElementSaver.java:140-165)
    ids = feats.select(F.col("id").alias("ref"))
    refs = rel.select(F.explode("members").alias("m")).select(F.col("m.ref").alias("ref"))
    unresolved = refs.join(ids, "ref", "left_anti").count()
    assert unresolved == 0


def test_span_sequence_invariant(spark, documents_df):
    """Pipeline must never reorder/mutate spans of surviving docs: the
    decode is a pure derivation, so fingerprints before == after."""
    fp1 = span_sequence_fingerprint(documents_df)
    # simulate a pipeline pass: decode, keep surviving doc_ids, re-read
    surviving = decode_documents(documents_df).select("doc_id")
    after = documents_df.join(surviving, "doc_id", "left_semi")
    fp2 = span_sequence_fingerprint(after)
    diff = (
        fp1.alias("a")
        .join(fp2.alias("b"), "doc_id")
        .filter(F.col("a.span_fp") != F.col("b.span_fp"))
        .count()
    )
    assert diff == 0
    assert fp2.count() == fp1.count()  # decode is total: every doc survives


def test_decode_min_res(spark, documents_df):
    feats = decode_documents(documents_df)
    res_vals = {r["min_res"] for r in feats.select("min_res").distinct().collect()}
    assert 24 in res_vals
    assert any(v < 24 for v in res_vals)  # fixture encodes coarse-level features
