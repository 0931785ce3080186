"""Tests for segment join, merges, simplify filters, dedup, text,
similarity, raster overlay, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


# ---------------------------------------------------------------- segments
def test_segment_intersection_join(spark):
    from mkgmap_spark.operators.segment_join import segment_intersection_join

    # way 1: horizontal line y=0; way 2: vertical crossing at (0, 5);
    # way 3: far away
    left = spark.createDataFrame(
        [(1, [0, 0], [0, 10])], "id long, lats array<int>, lons array<int>"
    )
    right = spark.createDataFrame(
        [(2, [-5, 5], [5, 5]), (3, [100000, 100001], [100000, 100000])],
        "id long, lats array<int>, lons array<int>",
    )
    got = {
        (r["left_id"], r["right_id"])
        for r in segment_intersection_join(left, right).collect()
    }
    assert got == {(1, 2)}


def test_segment_join_cross_cell(spark):
    """Segments crossing near a cell boundary must still match (cover
    cells, not centre cells)."""
    from mkgmap_spark.operators.segment_join import segment_intersection_join

    b = 1 << 14  # cell size at gshift=14
    left = spark.createDataFrame(
        [(1, [b - 5, b - 5], [b - 100, b + 100])], "id long, lats array<int>, lons array<int>"
    )
    right = spark.createDataFrame(
        [(2, [b - 50, b + 50], [b, b])], "id long, lats array<int>, lons array<int>"
    )
    got = segment_intersection_join(left, right).count()
    assert got == 1


def test_segment_join_rasterized_cover(spark):
    """The band-clipped supercover must not drop cells for long
    near-horizontal / near-vertical segments whose band crossing falls
    mid-segment, and must bound fanout to the cells along the line
    (not the bbox area) for long diagonals."""
    import random

    from mkgmap_spark.functions.geometry import segments_intersect
    from mkgmap_spark.operators.segment_join import (
        explode_segments,
        segment_intersection_join,
    )

    g = 14
    b = 1 << g
    # near-horizontal segment rising 1 unit across 40 cells, crossing a
    # band boundary mid-way; vertical probes at several x positions
    left = spark.createDataFrame(
        [(1, [b - 1, b + 1], [0, 40 * b])], "id long, lats array<int>, lons array<int>"
    )
    right = spark.createDataFrame(
        [(k, [b - 10, b + 10], [k * b + 17, k * b + 17]) for k in range(1, 40, 7)],
        "id long, lats array<int>, lons array<int>",
    )
    got = {r["right_id"] for r in segment_intersection_join(left, right, gshift=g).collect()}
    assert got == set(range(1, 40, 7))

    # randomized parity vs brute force + fanout bound for diagonals
    rng = random.Random(7)
    lw = [(i, [rng.randrange(-300000, 300000), rng.randrange(-300000, 300000)],
           [rng.randrange(-300000, 300000), rng.randrange(-300000, 300000)]) for i in range(25)]
    rw = [(i, [rng.randrange(-300000, 300000), rng.randrange(-300000, 300000)],
           [rng.randrange(-300000, 300000), rng.randrange(-300000, 300000)]) for i in range(25)]
    ldf = spark.createDataFrame(lw, "id long, lats array<int>, lons array<int>")
    rdf = spark.createDataFrame(rw, "id long, lats array<int>, lons array<int>")
    got = {(r["left_id"], r["right_id"])
           for r in segment_intersection_join(ldf, rdf, gshift=g).collect()}
    import numpy as np

    want = set()
    for li, llat, llon in lw:
        for ri, rlat, rlon in rw:
            hit = segments_intersect(
                np.array([llat[0]]), np.array([llon[0]]), np.array([llat[1]]), np.array([llon[1]]),
                np.array([rlat[0]]), np.array([rlon[0]]), np.array([rlat[1]]), np.array([rlon[1]]),
            )
            if hit[0]:
                want.add((li, ri))
    assert got == want

    # fanout: a pure diagonal over N x N cells must emit O(N) rows
    n_cells = 32
    diag = spark.createDataFrame(
        [(1, [0, n_cells * b - 1], [0, n_cells * b - 1])],
        "id long, lats array<int>, lons array<int>",
    )
    fan = explode_segments(diag, gshift=g).count()
    assert fan <= 4 * n_cells, f"diagonal fanout {fan} should be linear, not {n_cells ** 2}"


# ---------------------------------------------------------------- merge
def test_merge_lines_chains(spark):
    from mkgmap_spark.operators.merge import merge_lines

    rows = [
        # chain A: 1-2 share endpoint (10,10); 3 isolated; same key
        (1, "road", [0, 10], [0, 10], ),
        (2, "road", [10, 20], [10, 20]),
        (3, "road", [100, 110], [100, 110]),
        # different key never merges even if touching
        (4, "river", [20, 30], [20, 30]),
    ]
    df = spark.createDataFrame(rows, "id long, typ string, lats array<int>, lons array<int>")
    out = merge_lines(df, ["typ"]).collect()
    chains = {tuple(sorted(r["member_ids"])): r for r in out}
    assert (1, 2) in chains
    assert chains[(1, 2)]["total_points"] == 3  # 2+2 minus shared endpoint
    assert (3,) in chains
    assert (4,) in chains


# ---------------------------------------------------------------- simplify
def test_round_and_obsolete_and_dp(spark):
    from mkgmap_spark.operators import simplify

    df = spark.createDataFrame(
        [(1, [0, 3, 8, 8, 16], [0, 5, 10, 10, 20])],
        "id long, lats array<int>, lons array<int>",
    )
    r = simplify.round_coords(df, 2).collect()[0]
    assert r["lats"] == [0, 4, 8, 8, 16]
    assert r["lons"] == [0, 4, 12, 12, 20]

    # obsolete: duplicate collapses; collinear middle point drops
    df2 = spark.createDataFrame(
        [(1, [0, 5, 5, 10], [0, 5, 5, 10])], "id long, lats array<int>, lons array<int>"
    )
    r2 = simplify.remove_obsolete_points(df2).collect()[0]
    assert r2["lats"] == [0, 10] and r2["lons"] == [0, 10]

    df3 = spark.createDataFrame(
        [(1, [0, 1, 0], [0, 50, 100])], "id long, lats array<int>, lons array<int>"
    )
    r3 = simplify.douglas_peucker(df3, max_error=2.0).collect()[0]
    assert r3["lats"] == [0, 0]
    r3b = simplify.douglas_peucker(df3, max_error=0.5).collect()[0]
    assert r3b["lats"] == [0, 1, 0]


def test_split_long_lines(spark):
    from mkgmap_spark.operators.simplify import split_long_lines

    n = 600
    df = spark.createDataFrame(
        [(1, list(range(n)), list(range(n)))], "id long, lats array<int>, lons array<int>"
    )
    parts = split_long_lines(df, max_points=250).orderBy("part").collect()
    assert len(parts) == 3
    sizes = [len(p["lats"]) for p in parts]
    assert all(s <= 251 for s in sizes)
    # pieces chain: consecutive parts share one point, coverage complete
    assert sum(sizes) - (len(parts) - 1) == n
    assert parts[0]["lats"][-1] == parts[1]["lats"][0]
    # no tiny fragment (>= half target, LineSplitterFilter.java:80)
    assert min(sizes) >= 125


# ---------------------------------------------------------------- dedup
def test_exact_and_minhash_dedup(spark):
    from mkgmap_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")
    far = "completely different words about spark partitions and shuffles here"
    docs = spark.createDataFrame(
        [("a", base), ("b", base), ("c", near), ("d", far)], "doc_id string, text string"
    )
    ex = dedup.exact_dedup(docs).collect()
    assert len(ex) == 1 and ex[0]["n_docs"] == 2 and ex[0]["keep_id"] == "a"

    pairs = dedup.minhash_dedup(docs, threshold=0.5).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert ("a", "b") in got  # identical
    assert ("a", "c") in got or ("b", "c") in got  # near-dup found
    assert all("d" not in p for p in got)  # far doc never matches


def test_ngram_jaccard_pairs(spark):
    """Exact inverted-index Jaccard: identical docs score 1.0, the
    one-token edit scores (n-1-k)/(n-1+k)-ish, far docs never pair;
    max_df drops stop-shingle-only connections."""
    from mkgmap_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")
    far = "completely different words about spark partitions and shuffles here"
    docs = spark.createDataFrame(
        [("a", base), ("b", base), ("c", near), ("d", far)], "doc_id string, text string"
    )
    rows = dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    assert got[("a", "b")] == 1.0
    assert 0.3 <= got[("a", "c")] < 1.0
    assert all("d" not in p for p in got)
    # exact values match the verify kernel's Jaccard on the same pairs
    cand = spark.createDataFrame([("a", "b"), ("a", "c")], "doc_a string, doc_b string")
    want = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_verify(cand, docs, threshold=0.0).collect()
    }
    assert got[("a", "b")] == want[("a", "b")]
    assert got[("a", "c")] == want[("a", "c")]
    # max_df=1: every shared shingle between a and b has df>=2 -> the
    # identical pair loses all its connecting shingles and vanishes
    capped = dedup.ngram_jaccard_pairs(docs, threshold=0.3, max_df=1).collect()
    assert capped == []


def test_simhash(spark):
    from mkgmap_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            ("a", "alpha beta gamma delta epsilon zeta eta theta"),
            ("b", "alpha beta gamma delta epsilon zeta eta iota"),
            ("c", "totally unrelated content words nothing shared at all"),
        ],
        "doc_id string, text string",
    )
    fps = dedup.simhash(docs)
    rows = {r["doc_id"]: r["simhash"] for r in fps.collect()}
    mask = (1 << 64) - 1
    ham_ab = bin((rows["a"] ^ rows["b"]) & mask).count("1")
    ham_ac = bin((rows["a"] ^ rows["c"]) & mask).count("1")
    assert ham_ab < ham_ac  # similar docs closer in hamming space

    # band-bucket guarantee: bands = max_hamming + 1, so any pair
    # within the distance budget shares at least one identical band
    # (pigeonhole) — including adversarial flip patterns spread across
    # the old fixed 4 bands
    base = 0x0123456789ABCDEF
    synth = spark.createDataFrame(
        [
            ("x", base),
            ("y", base ^ 0b111),  # 3 flips, same region
            ("z", base ^ ((1 << 0) | (1 << 16) | (1 << 32) | (1 << 48))),  # spread flips
        ],
        "doc_id string, simhash long",
    )
    near = dedup.simhash_near_dups(synth, max_hamming=4).collect()
    got = {frozenset((r["doc_a"], r["doc_b"])) for r in near}
    assert frozenset(("x", "y")) in got
    assert frozenset(("x", "z")) in got  # hamming 4 <= 4: recall guaranteed

    near3 = dedup.simhash_near_dups(synth, max_hamming=3).collect()
    got3 = {frozenset((r["doc_a"], r["doc_b"])) for r in near3}
    assert frozenset(("x", "y")) in got3
    assert frozenset(("x", "z")) not in got3  # hamming 4 > 3: filtered


# ---------------------------------------------------------------- text
def test_language_id_and_quality(spark):
    from mkgmap_spark.operators import text as tx

    docs = spark.createDataFrame(
        [
            ("e", "the cat sat on the mat and the dog was there"),
            ("g", "der hund und die katze sind nicht da"),
            ("u", "zzz qqq www"),
        ],
        "doc_id string, text string",
    )
    pred = {r["doc_id"]: r["pred_lang"] for r in tx.language_id(docs).collect()}
    assert pred["e"] == "en" and pred["g"] == "de" and pred["u"] == "und"

    q = {r["doc_id"]: r for r in tx.quality_scores(docs).collect()}
    assert q["e"]["n_tokens"] == 11
    assert q["e"]["n_distinct_tokens"] == 9
    tk = {r["doc_id"]: r for r in tx.token_counts(docs).collect()}
    assert tk["e"]["n_words"] == 11
    assert tk["e"]["est_subword_tokens"] >= 11


# ---------------------------------------------------------------- similarity
def test_similarity_brute_vs_lsh(spark):
    from mkgmap_spark.operators.similarity import brute_force_topk, lsh_topk

    rng = np.random.RandomState(3)
    vecs = rng.normal(size=(200, 16)).astype(np.float32)
    # plant near-duplicates of vec 0 and 1
    vecs[100] = vecs[0] + rng.normal(scale=0.01, size=16).astype(np.float32)
    vecs[101] = vecs[1] + rng.normal(scale=0.01, size=16).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(200), "embedding": [v.tolist() for v in vecs]})
    emb = spark.createDataFrame(pdf)
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    exact = brute_force_topk(emb, q, k=1).collect()
    top = {r["qid"]: r["nid"] for r in exact}
    assert top == {0: 100, 1: 101}

    approx = lsh_topk(emb, q, k=1, dim=16, n_planes=16, bands=8).collect()
    atop = {r["qid"]: r["nid"] for r in approx}
    assert atop == {0: 100, 1: 101}  # planted twins share buckets


def test_similarity_ivf(spark):
    """IVF bucketing: planted near-twins land in the query's own
    nearest-centroid bucket, so nprobe-probing finds them; results
    rank by exact integer dot."""
    from mkgmap_spark.operators.similarity import ivf_topk_int

    rng = np.random.RandomState(7)
    vecs = rng.normal(size=(300, 16)).astype(np.float32)
    vecs[200] = vecs[0] + rng.normal(scale=0.01, size=16).astype(np.float32)
    vecs[201] = vecs[1] + rng.normal(scale=0.01, size=16).astype(np.float32)
    qv = [[int(round(float(x) * 10_000)) for x in v] for v in vecs]
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(300), "qv": qv})
    )
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("qv")
    )
    out = ivf_topk_int(emb, q, k=1, n_centroids=8, nprobe=3).collect()
    top = {r["qid"]: r["neighbor_id"] for r in out}
    assert top == {0: 200, 1: 201}
    assert all(r["rank"] == 1 for r in out)


# ---------------------------------------------------------------- raster/mm
def test_raster_overlay_and_multimodal(spark, documents_df, fixture_dir):
    import os

    from mkgmap_spark.operators.decode import decode_documents
    from mkgmap_spark.operators.multimodal import decode_media_features, media_table_from_documents
    from mkgmap_spark.operators.raster import overlay_sample

    media = media_table_from_documents(documents_df)
    n_media = media.count()
    assert n_media > 0
    feats = decode_media_features(media)
    rows = feats.collect()
    assert len(rows) == n_media
    # real PNG decode: dimensions come out of IHDR, channel means out
    # of the reconstructed pixels (gradient channels average ~127.5)
    assert all(r["width"] > 0 and r["height"] > 0 and r["thumb_md5"] for r in rows)
    assert all(0 <= r["mean_r"] <= 255 and 0 <= r["mean_g"] <= 255 for r in rows)
    # deterministic: same ref -> same fingerprint
    again = {(r["doc_id"], r["thumb_md5"]) for r in decode_media_features(media).collect()}
    assert {(r["doc_id"], r["thumb_md5"]) for r in rows} == again

    rasters = spark.read.parquet(os.path.join(fixture_dir, "raster_thumbs.parquet"))
    docs_pts = (
        decode_documents(documents_df)
        .filter(F.size("media_refs") > 0)
        .filter(F.size("lats") > 0)
        .select(
            "id",
            F.expr("lats[0]").alias("ay"),
            F.expr("lons[0]").alias("ax"),
            F.expr("media_refs[0]").alias("media_ref"),
        )
    )
    sampled = overlay_sample(docs_pts, rasters)
    out = sampled.collect()
    assert len(out) > 0
    vals = [r["sampled"] for r in out]
    assert all(0 <= v <= 267 for v in vals)  # gradient 0..250 + noise 0..16


def test_smoothing_filter(spark):
    from mkgmap_spark.operators.simplify import smoothing_filter

    df = spark.createDataFrame(
        [(1, [0, 1, 2, 40, 41, 80], [0, 1, 2, 40, 41, 80])],
        "id long, lats array<int>, lons array<int>",
    )
    r = smoothing_filter(df, gshift=5).collect()[0]  # cells of 32
    assert r["lats"] == [0, 40, 80]


def test_bicubic_sample():
    import numpy as np

    from mkgmap_spark.operators.raster import bicubic_sample, bilinear_sample

    # a linear gradient is reproduced exactly by both kernels
    h, w = 8, 8
    yy, xx = np.mgrid[0:h, 0:w]
    grad = (3.0 * xx + 2.0 * yy).ravel()
    fx = np.array([2.5, 3.25, 0.0])
    fy = np.array([1.5, 4.75, 0.0])
    bc = bicubic_sample(grad, w, h, fx, fy)
    bl = bilinear_sample(grad, w, h, fx, fy)
    assert np.allclose(bc, 3 * fx + 2 * fy)
    assert np.allclose(bc, bl)


def test_propagate_labels(spark):
    from mkgmap_spark.operators.propagate import propagate_labels

    # chain: A(labeled) - B - C - D; E isolated
    rows = [
        (1, [0, 10], [0, 10], "CITY"),
        (2, [10, 20], [10, 20], None),
        (3, [20, 30], [20, 30], None),
        (4, [30, 40], [30, 40], None),
        (5, [99, 98], [99, 98], None),
    ]
    df = spark.createDataFrame(rows, "id long, lats array<int>, lons array<int>, destination string")
    got = {r["id"]: r["destination"] for r in propagate_labels(df, max_depth=3).collect()}
    assert got[2] == "CITY" and got[3] == "CITY" and got[4] == "CITY"
    assert got[5] is None


def test_coastline_assembly(spark):
    from mkgmap_spark.operators.sea import assemble_coastlines, coastline_components

    # square coast from 4 ways with ~30-unit gaps at the joints
    # (closed by endpoint snapping at 2^6); plus a separate open arc
    rows = [
        (1, [0, 0], [0, 1000]),
        (2, [0 + 20, 1000], [1000 + 15, 1000]),      # snaps to (0,1000)
        (3, [1000, 1000], [1000, 0]),
        (4, [1000 - 25, 10], [0, 0 + 30]),           # snaps both ends
        (9, [50000, 60000], [50000, 60000]),
    ]
    ways = spark.createDataFrame(rows, "id long, lats array<int>, lons array<int>")
    comp = {r["id"]: r["component"] for r in coastline_components(ways, snap_shift=6).collect()}
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1
    assert comp[9] == 9

    out = {r["component"]: r for r in assemble_coastlines(ways, snap_shift=6).collect()}
    assert out[1]["n_ways"] == 4 and out[1]["closed"]
    assert out[9]["n_ways"] == 1 and not out[9]["closed"]


def test_merge_shapes_dissolve(spark):
    from mkgmap_spark.operators.merge import merge_shapes
    from mkgmap_spark.functions.geometry import shoelace2
    import numpy as np

    # two adjacent CCW unit squares sharing edge x=10 -> one rectangle
    sq1 = ([0, 0, 10, 10], [0, 10, 10, 0])
    sq2 = ([0, 0, 10, 10], [10, 20, 20, 10])
    far = ([100, 100, 110, 110], [100, 110, 110, 100])
    rows = [
        (1, "a", sq1[0], sq1[1]),
        (2, "a", sq2[0], sq2[1]),
        (3, "a", far[0], far[1]),
        (4, "b", sq2[0], sq2[1]),
    ]
    df = spark.createDataFrame(rows, "id long, grp string, lats array<int>, lons array<int>")
    out = merge_shapes(df, ["grp"]).collect()
    a_rings = [r for r in out if r["grp"] == "a"]
    b_rings = [r for r in out if r["grp"] == "b"]
    assert len(a_rings) == 2  # dissolved rectangle + the far square
    assert len(b_rings) == 1
    # area conservation: 100 + 100 + 100 for group a (x2 signed)
    in_area = sum(
        shoelace2(np.array(r[2]), np.array(r[3])) for r in rows if r[1] == "a"
    )
    assert sum(r["area2"] for r in a_rings) == in_area
    # the dissolved ring has 6 points (seam corners kept as vertices)
    assert sorted(r["n_points"] for r in a_rings) == [4, 6]


# --------------------------------------------------------- road merge
def test_merge_roads_semantics(spark):
    """RoadMerger rules: equal-attribute end-to-start chains merge;
    class/tag mismatches, sharp angles (>130 deg), restricted via
    points, and closing loops block the merge."""
    from mkgmap_spark.operators.merge import merge_roads

    def road(rid, pts, rc=2, rs=3, acc=255, fl=0, tags=None, restricted=None):
        la = [p[0] for p in pts]
        lo = [p[1] for p in pts]
        return (rid, la, lo, rc, rs, acc, fl, tags or {}, restricted or [])

    rows = [
        # straight chain a->b->c : merges into one road
        road(1, [(0, 0), (0, 1000)]),
        road(2, [(0, 1000), (0, 2000)]),
        # different road_class: no merge with 3's neighbour
        road(3, [(10_000, 0), (10_000, 1000)], rc=4),
        road(4, [(10_000, 1000), (10_000, 2000)]),
        # sharp switchback (~180 deg turn): no merge
        road(5, [(20_000, 0), (20_000, 1000)]),
        road(6, [(20_000, 1000), (20_000, 1)]),
        # label mismatch: no merge
        road(7, [(30_000, 0), (30_000, 1000)], tags={"mkgmap:label:1": "A"}),
        road(8, [(30_000, 1000), (30_000, 2000)], tags={"mkgmap:label:1": "B"}),
        # restricted via point: no merge
        road(9, [(40_000, 0), (40_000, 1000)], restricted=[[40_000, 1000]]),
        road(10, [(40_000, 1000), (40_000, 2000)]),
    ]
    df = spark.createDataFrame(
        rows,
        "id long, lats array<int>, lons array<int>, road_class int, road_speed int, "
        "access long, route_flags long, tags map<string,string>, restricted array<array<int>>",
    )
    out = {r["id"]: r for r in merge_roads(df).collect()}
    assert out[1]["n_members"] == 2 and out[1]["member_ids"] == [1, 2]
    assert out[1]["lats"] == [0, 0, 0] and out[1]["lons"] == [0, 1000, 2000]
    assert out[3]["n_members"] == 1 and out[4]["n_members"] == 1
    assert out[5]["n_members"] == 1 and out[6]["n_members"] == 1
    assert out[7]["n_members"] == 1 and out[8]["n_members"] == 1
    assert out[9]["n_members"] == 1 and out[10]["n_members"] == 1


def test_merge_roads_no_closed_way(spark):
    from mkgmap_spark.operators.merge import merge_roads

    # two halves of a ring: merging once is fine, closing is not
    rows = [
        (1, [0, 0, 1000], [0, 1000, 1000], 2, 3, 255, 0, {}),
        (2, [1000, 1000, 0], [1000, 0, 0], 2, 3, 255, 0, {}),
    ]
    df = spark.createDataFrame(
        rows,
        "id long, lats array<int>, lons array<int>, road_class int, road_speed int, "
        "access long, route_flags long, tags map<string,string>",
    )
    out = merge_roads(df).collect()
    # both orderings would close the ring -> stays two roads
    assert sorted(r["n_members"] for r in out) == [1, 1]


def test_delete_tags_filter(spark):
    from mkgmap_spark.operators.decode import delete_tags_filter

    spec = """
    # drop these
    created_by=*
    highway=proposed
    ; comment style two
    bad line ignored
    """
    df = spark.createDataFrame(
        [
            (1, {"created_by": "editor", "highway": "primary", "name": "x"}),
            (2, {"highway": "proposed", "name": "y"}),
            (3, {"note": "FIX ME", "fixme": "continue here", "name": "fixme"}),
        ],
        "id long, tags map<string,string>",
    )
    out = {r["id"]: dict(r["tags"]) for r in delete_tags_filter(df, spec).collect()}
    assert out[1] == {"highway": "primary", "name": "x"}  # created_by=* dropped
    assert out[2] == {"name": "y"}  # highway=proposed dropped
    # FIXME-pattern values dropped (>=5 chars), fixme KEY kept,
    # 5-char 'fixme' value dropped
    assert out[3] == {"fixme": "continue here"}


def test_line_size_splitter(spark):
    from mkgmap_spark.operators.simplify import line_size_splitter

    max_size = 0x7FFF
    small = ([0, 100, 200], [0, 100, 200])
    # line spanning ~3x the limit in lon, with one long segment that
    # must be densified before the bbox scan
    big_la = [0, 0, 0]
    big_lo = [0, 90_000, 100_000]
    df = spark.createDataFrame(
        [(1, small[0], small[1]), (2, big_la, big_lo)],
        "id long, lats array<int>, lons array<int>",
    )
    out = line_size_splitter(df, shift=0).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r)
    assert len(by_id[1]) == 1 and by_id[1][0]["part"] == 0
    parts = sorted(by_id[2], key=lambda r: r["part"])
    assert len(parts) >= 3
    # each part under the limit; consecutive parts share a point
    for p in parts:
        assert max(p["lats"]) - min(p["lats"]) <= max_size
        assert max(p["lons"]) - min(p["lons"]) <= max_size
    for a, b in zip(parts, parts[1:]):
        assert a["lats"][-1] == b["lats"][0] and a["lons"][-1] == b["lons"][0]
    # no geometry lost: the x-extent is covered
    assert parts[0]["lons"][0] == 0 and parts[-1]["lons"][-1] == 100_000


def test_png_codec_roundtrip():
    """Pure-numpy PNG codec: encode -> decode round-trips exactly; the
    decoder also reconstructs all five scanline filter types (foreign
    encoders), verified by re-filtering a known image."""
    import zlib

    import numpy as np

    from mkgmap_spark.functions.png import decode_png, encode_png, is_png, resize_nearest

    rng = np.random.RandomState(7)
    for shape in [(5, 3), (5, 3, 3), (4, 7, 4), (1, 1, 3)]:
        img = rng.randint(0, 256, size=shape, dtype=np.uint16).astype(np.uint8)
        png = encode_png(img)
        assert is_png(png)
        out = decode_png(png)
        want = img[:, :, None] if img.ndim == 2 else img
        assert out.shape == want.shape
        assert (out == want).all()

    # hand-build a PNG using Sub/Up/Average/Paeth filters per row
    import struct

    img = rng.randint(0, 256, size=(4, 6, 3), dtype=np.uint16).astype(np.uint8)
    h, w, c = img.shape
    rows = []
    prev = np.zeros(w * c, dtype=np.int32)
    flat = img.reshape(h, w * c).astype(np.int32)
    for y, f in enumerate([1, 2, 3, 4]):
        line = flat[y]
        enc = line.copy()
        for x in range(w * c):
            a = line[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            enc[x] = (line[x] - pred) & 0xFF
        rows.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(tag, payload):
        return struct.pack(">I", len(payload)) + tag + payload + struct.pack(
            ">I", zlib.crc32(tag + payload) & 0xFFFFFFFF
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + chunk(b"IEND", b"")
    )
    assert (decode_png(png) == img).all()

    # nearest resize: exact on integer-ratio downscale
    big = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    small = resize_nearest(big, 4, 4)
    assert small.shape == (4, 4, 3)
    assert (small == big[::2, ::2]).all()


def test_prefix_suffix_filter(spark):
    """PrefixSuffixFilter semantics against the reference's OWN shipped
    road-name config (resources/roadNameConfig.txt): prefix blank ->
    0x1e, suffix blank -> 0x1f, case-insensitive longest-first match,
    shield-coded labels untouched."""
    from mkgmap_spark.operators.text import (
        parse_road_name_config,
        prefix_suffix_filter,
    )

    cfg = open("/root/reference/resources/roadNameConfig.txt").read()
    prefs, sufs = parse_road_name_config(cfg)
    assert "Rue de la " in prefs["FRA"]
    assert prefs["FRA"].index("Rue de la ") < prefs["FRA"].index("Rue ")  # longest first
    assert " Road" in sufs["GBR"]

    rows = [
        (1, {"mkgmap:label:1": "Rue de la Paix", "mkgmap:country": "FRA"}),
        (2, {"mkgmap:label:1": "West Main Street", "mkgmap:country": "GBR"}),
        (3, {"mkgmap:label:1": "Hauptstrasse 5", "mkgmap:country": "DEU"}),
        (4, {"mkgmap:label:1": "\x05A66", "mkgmap:country": "FRA"}),  # shield code
        (5, {"mkgmap:label:1": "Rue de la Paix"}),  # no country -> untouched
    ]
    df = spark.createDataFrame(rows, "id long, tags map<string,string>")
    out = {r["id"]: dict(r["tags"])["mkgmap:label:1"]
           for r in prefix_suffix_filter(df, cfg).collect()}
    assert out[1] == "Rue de la" + chr(0x1E) + "Paix"
    # the en config writes '"West "' WITH the trailing blank; the
    # reference's genPrefix appends another (p1 + " "), producing
    # "West  " which never matches — faithfully reproduced, so only
    # the suffix fires here
    assert out[2] == "West Main" + chr(0x1F) + "Street"
    assert out[3] == "Hauptstrasse 5"  # ' Strasse' suffix needs the blank
    assert out[4] == "\x05A66"
    assert out[5] == "Rue de la Paix"


def test_layer_filter_chains(spark):
    """Round -> Size -> DP -> Split -> RemoveObsolete composition: at
    coarse resolutions lines lose points but keep endpoints; sub-pixel
    features drop; nothing degenerate survives."""
    import random

    from mkgmap_spark.operators.simplify import line_filter_chain, shape_filter_chain

    rng = random.Random(5)
    rows = []
    for i in range(40):
        n = rng.randint(2, 300)
        la = [rng.randint(0, 1 << 18) for _ in range(n)]
        lo = [rng.randint(0, 1 << 18) for _ in range(n)]
        rows.append((i, la, lo))
    # a sub-pixel feature at res 16 (extent < 2^8 map units << shift)
    rows.append((99, [0, 3, 5], [0, 2, 4]))
    df = spark.createDataFrame(rows, "id long, lats array<int>, lons array<int>")

    fine = line_filter_chain(df, resolution=24)
    coarse = line_filter_chain(df, resolution=16)
    n_fine = fine.select(F.sum(F.size("lats"))).collect()[0][0]
    n_coarse = coarse.select(F.sum(F.size("lats"))).collect()[0][0]
    assert n_coarse < n_fine
    assert coarse.filter(F.col("id") == 99).count() == 0  # sub-pixel dropped
    assert fine.select(F.max(F.size("lats"))).collect()[0][0] <= 251
    assert coarse.select(F.min(F.size("lats"))).collect()[0][0] >= 2

    shp = spark.createDataFrame(
        [(1, [0, 0, 60000, 60000, 0], [0, 60000, 60000, 0, 0])],
        "id long, lats array<int>, lons array<int>",
    )
    out = shape_filter_chain(shp, resolution=18).collect()
    assert len(out) == 1 and len(out[0]["lats"]) >= 3


def test_audio_wav_decode(spark):
    """Real WAV decode: RIFF parse via the stdlib, duration/rate/rms
    out of actual PCM frames."""
    from mkgmap_spark.operators.multimodal import decode_media_features, fake_wav_payload

    rows = [("d1", "a1", "audio", fake_wav_payload("a1"), 0, 0),
            ("d2", "a2", "audio", fake_wav_payload("a2", seconds=0.5), 0, 0)]
    media = spark.createDataFrame(
        rows, "doc_id string, media_ref string, kind string, payload binary, width int, height int"
    )
    out = {r["media_ref"]: r for r in decode_media_features(media).collect()}
    assert out["a1"]["sample_rate"] == 8000
    assert abs(out["a1"]["duration_s"] - 0.25) < 1e-6
    assert abs(out["a2"]["duration_s"] - 0.5) < 1e-6
    # sine rms ~ amplitude/sqrt(2)
    assert 7000 < out["a1"]["mean_r"] < 10000
    assert out["a1"]["thumb_md5"] != out["a2"]["thumb_md5"]


def test_embedding_near_dups(spark):
    """Planted scaled copy (cosine ~ 1) surfaces as a near-dup pair;
    unrelated vectors stay out at a high threshold."""
    from mkgmap_spark.operators.similarity import embedding_near_dups

    rng = np.random.RandomState(5)
    vecs = rng.normal(size=(150, 16)).astype(np.float32)
    vecs[100] = vecs[3] * 1.01
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(150), "embedding": [v.tolist() for v in vecs]})
    )
    out = embedding_near_dups(emb, threshold=0.95, dim=16).collect()
    assert [(r["vec_a"], r["vec_b"]) for r in out] == [(3, 100)]
    assert out[0]["cos2"] > 0.99


def test_road_network_graph(spark):
    """Junction + arc extraction (RoadNetwork.addRoad semantics):
    shared coords split ways into arcs; endpoints are always nodes;
    a way revisiting its own point IS a junction (the reference splits
    self-intersecting ways at the revisited point,
    StyledConverter.addRoadAfterSplittingLoops)."""
    from mkgmap_spark.operators.road_network import road_network

    roads = spark.createDataFrame(
        [
            # way 1: passes through (5,5), which way 2 also uses -> split
            (1, [0, 5, 9], [0, 5, 9], 3, 4),
            (2, [5, 5], [5, 20], 2, 2),
            # way 3: closed loop — revisit coincides with the endpoints,
            # already nodes, so still one arc
            (3, [50, 60, 50], [50, 60, 50], 1, 1),
            # way 4: P-shaped loop A-B-C-B-D — interior revisit of
            # (110,110) must split into 3 arcs like the reference
            (4, [100, 110, 120, 110, 140], [100, 110, 120, 110, 140], 2, 3),
        ],
        "id long, lats array<int>, lons array<int>, road_class int, road_speed int",
    )
    nodes, arcs = road_network(roads)
    arc_rows = {(r["way_id"], r["arc_idx"]): r for r in arcs.collect()}
    # way 1 splits at (5,5): two arcs
    assert set(k for k in arc_rows if k[0] == 1) == {(1, 0), (1, 1)}
    a0, a1 = arc_rows[(1, 0)], arc_rows[(1, 1)]
    assert (a0["from_y"], a0["from_x"], a0["to_y"], a0["to_x"]) == (0, 0, 5, 5)
    assert (a1["from_y"], a1["from_x"], a1["to_y"], a1["to_x"]) == (5, 5, 9, 9)
    assert a0["cost"] == 10 and a1["cost"] == 8  # manhattan map units
    assert a0["road_class"] == 3
    # way 2: single arc
    assert arc_rows[(2, 0)]["cost"] == 15
    # way 3: one arc spanning all 3 points (revisit == endpoints)
    assert set(k for k in arc_rows if k[0] == 3) == {(3, 0)}
    assert arc_rows[(3, 0)]["n_points"] == 3
    # way 4: interior self-revisit splits: A-B, B-C-B, B-D
    assert set(k for k in arc_rows if k[0] == 4) == {(4, 0), (4, 1), (4, 2)}
    b0, b1, b2 = arc_rows[(4, 0)], arc_rows[(4, 1)], arc_rows[(4, 2)]
    assert (b0["from_y"], b0["to_y"]) == (100, 110)
    assert (b1["from_y"], b1["to_y"]) == (110, 110) and b1["n_points"] == 3
    assert (b2["from_y"], b2["to_y"]) == (110, 140)
    nd = {(r["node_y"], r["node_x"]) for r in nodes.collect()}
    assert (5, 5) in nd and (0, 0) in nd and (9, 9) in nd
    assert (110, 110) in nd  # loop junction
    assert (60, 60) not in nd and (120, 120) not in nd  # interior non-junctions


def test_roundabout_check_and_drive_side(spark):
    """Direction votes flag roundabouts contradicting the driving side
    (checkRoundabout semantics); drive side detection follows the
    L > R + unknown rule."""
    from mkgmap_spark.operators.roundabouts import check_roundabouts, detect_drive_side

    # hexagon listed with (lat=cos, lon=sin): in map view (lon east,
    # lat north) this walks CLOCKWISE; the reversed ring is CCW
    hexa = [(1000, 0), (500, 866), (-500, 866), (-1000, 0), (-500, -866), (500, -866)]
    cwr = hexa + [hexa[0]]
    ccw = list(reversed(cwr))
    rings = spark.createDataFrame(
        [
            (1, [p[0] for p in cwr], [p[1] for p in cwr]),
            (2, [p[0] for p in ccw], [p[1] for p in ccw]),
        ],
        "id long, lats array<int>, lons array<int>",
    )
    for planar in (False, True):
        out = {r["id"]: r for r in check_roundabouts(rings, drive_on_left=False, planar=planar).collect()}
        assert out[1]["clockwise"] is True and out[2]["clockwise"] is False, planar
        assert out[1]["wrong_direction"] is True  # drive-on-right wants CCW
        assert out[2]["wrong_direction"] is False

    # 2.5 m guard (StyledConverter.java:983): a ring hugging its
    # centre (all starts < 2.5 m from centre) must produce ZERO trig
    # votes — the planar path still votes (exact, guard-free)
    tiny = [(1, 0), (0, 1), (-1, 0), (0, -1), (1, 0)]
    tiny_df = spark.createDataFrame(
        [(9, [p[0] for p in tiny], [p[1] for p in tiny])],
        "id long, lats array<int>, lons array<int>",
    )
    trig = check_roundabouts(tiny_df, drive_on_left=False, planar=False).collect()[0]
    assert trig["dir_votes"] == 0 and trig["wrong_direction"] is False
    exact = check_roundabouts(tiny_df, drive_on_left=False, planar=True).collect()[0]
    assert exact["dir_votes"] != 0

    roads = spark.createDataFrame(
        [(1, "left"), (2, "left"), (3, "right"), (4, None)],
        "id long, drive_side string",
    )
    assert detect_drive_side(roads) is False  # 2 left !> 1 right + 1 unknown
    more_left = roads.union(
        spark.createDataFrame([(5, "left"), (6, "left")], "id long, drive_side string")
    )
    assert detect_drive_side(more_left) is True  # 4 > 1 + 1


# ---------------------------------------------------------------- sea synthesis
def test_sea_polygon_synthesis_kernel():
    """SeaGenerator.end() contract: a coast crossing the bbox makes a
    border landmass + sea background; closed rings split island vs
    anti-island by orientation; empty tile -> land rectangle."""
    from mkgmap_spark.operators.sea import synthesize_tile_sea

    B = (0, 0, 65536, 65536)
    # open coastline west edge -> east edge (land side = north, since
    # the border walk joins over the N corners)
    coast = ([20000, 30000, 25000], [0, 32768, 65536])
    out = synthesize_tile_sea([coast], B, metric="planar")
    kinds = [k for k, _ in out]
    assert kinds == ["land", "sea"]
    land = out[0][1]
    assert land[0] == land[-1]  # closed
    # contains both bbox N corners (the CCW border walk inserts them)
    assert (65536, 65536) in land and (65536, 0) in land
    sea = out[1][1]
    assert sea[0] == (-1, -1) and (65537, 65537) in sea

    # island (CCW in lon/lat) + lake (CW) inside it
    def square(cy, cx, h, ccw):
        pts = [(cy - h, cx - h), (cy - h, cx + h), (cy + h, cx + h), (cy + h, cx - h)]
        if not ccw:
            pts = list(reversed(pts))
        return ([p[0] for p in pts] + [pts[0][0]], [p[1] for p in pts] + [pts[0][1]])

    island = square(20000, 32768, 8000, ccw=True)
    lake = square(20000, 32768, 2000, ccw=False)
    out = synthesize_tile_sea([coast, island, lake], B, metric="planar")
    kinds = [k for k, _ in out]
    # islands in input order first, then landmass, then background
    assert kinds == ["land", "water", "land", "sea"]

    # lone lake (not inside any island, sea background): converted to land
    out = synthesize_tile_sea([coast, lake], B, metric="planar")
    assert [k for k, _ in out] == ["land", "land", "sea"]

    # no shoreline: land background only
    out = synthesize_tile_sea([], B, metric="planar")
    assert [k for k, _ in out] == ["land"]
    assert out[0][1][0] == (0, 0) and (65536, 65536) in out[0][1]

    # nearly-closed open chain (gap < 10% of length): closed as island
    ring_y = [30000, 30000, 40000, 40000, 30000]
    ring_x = [30000, 40000, 40000, 30000, 30100]  # 100-unit gap
    out = synthesize_tile_sea([(ring_y, ring_x)], B, metric="planar")
    # becomes a closed island -> background sea needs islands: yes
    assert [k for k, _ in out] == ["land", "sea"]
    assert out[0][1][0] == out[0][1][-1]

    # far-from-closed chain not reaching the border: sea sector, no
    # sea background (allowSeaSectors path)
    arc = ([20000, 30000, 40000], [20000, 30000, 20000])
    out = synthesize_tile_sea([arc], B, metric="planar")
    assert [k for k, _ in out] == ["sea", "land"]
    sector = out[0][1]
    assert sector[-1] == (20000, 20000) and (40000, 20000) in sector


def test_generate_sea_polygons_dataframe(spark):
    """Distributed per-tile synthesis incl. the empty-tile land path."""
    from mkgmap_spark.operators.sea import generate_sea_polygons

    chains = spark.createDataFrame(
        [(1, 0, [20000, 30000, 25000], [0, 32768, 65536])],
        "tile_id long, chain_id int, lats array<int>, lons array<int>",
    )
    bounds = spark.createDataFrame(
        [(1, 0, 0, 65536, 65536), (2, 0, 0, 65536, 65536)],
        "tile_id long, min_lat int, min_lon int, max_lat int, max_lon int",
    )
    rows = generate_sea_polygons(chains, bounds, metric="planar").collect()
    by_tile = {}
    for r in rows:
        by_tile.setdefault(r["tile_id"], set()).add((r["kind"], r["poly"]))
    assert by_tile[1] == {("land", 0), ("sea", 1)}
    assert by_tile[2] == {("land", 0)}  # empty tile -> land rect


# ---------------------------------------------------------------- flares
def _flare_graph(variant="good", ring=4):
    """Arcs for one roundabout ring R0..R{ring-1} (forward around,
    length 100 each, road 900) with a flare triangle at R0/R1 -> apex
    1000, plus a two-way road 800 at the apex (so R1 'connects to a
    non-roundabout segment' is NOT what settles the walk — the flares
    themselves do) and, per variant, broken flare properties."""
    arcs = []

    def arc(f, t, road, rab=False, ow=False, fwd=True, ln=50, fc=False):
        arcs.append((f, t, road, rab, ow, fwd, ln, fc, False))

    for i in range(ring):
        arc(i, (i + 1) % ring, 900, rab=True, ow=True, fwd=True, ln=100)
        arc((i + 1) % ring, i, 900, rab=True, ow=True, fwd=False, ln=100)
    apex = 1000
    out_ow = variant != "out-not-oneway"
    in_ow = variant != "in-not-oneway"
    out_fwd = variant != "out-backward"
    in_fwd = variant == "in-forward"
    # outgoing flare road 701: direction R0 -> apex (unless broken)
    arc(0, apex, 701, ow=out_ow, fwd=out_fwd, fc=True)
    arc(apex, 0, 701, ow=out_ow, fwd=not out_fwd, fc=True)
    # incoming flare road 702: direction apex -> R1
    arc(apex, 1, 702, ow=in_ow, fwd=not in_fwd, fc=True)
    arc(1, apex, 702, ow=in_ow, fwd=in_fwd, fc=True)
    # two-way continuation road at the apex
    arc(apex, 2000, 800, fwd=True, fc=True)
    arc(2000, apex, 800, fwd=False, fc=True)
    if variant == "out-continues":
        arc(apex, 2001, 701, fwd=out_fwd, fc=True)
        arc(2001, apex, 701, fwd=not out_fwd, fc=True)
    return arcs


def test_roundabout_flare_checks(spark):
    from mkgmap_spark.operators.flares import (
        WARN_IN_DIR,
        WARN_IN_ONEWAY,
        WARN_OUT_DIR,
        WARN_OUT_ONEWAY,
        check_roundabout_flares,
    )

    schema = (
        "from_id long, to_id long, road_id long, roundabout boolean, "
        "oneway boolean, forward boolean, length long, flare_check boolean, "
        "synthesised boolean"
    )
    expect = {
        "good": None,
        "out-backward": WARN_OUT_DIR,
        "in-forward": WARN_IN_DIR,
        "out-not-oneway": WARN_OUT_ONEWAY,
        "in-not-oneway": WARN_IN_ONEWAY,
    }
    for variant, want in expect.items():
        arcs = spark.createDataFrame(_flare_graph(variant), schema)
        rows = check_roundabout_flares(arcs).collect()
        # flare triangle candidates with road 800 as a second "fb" also
        # join; keep the true triangle rows (701 out, 702 in)
        tri = [r for r in rows if r["out_road"] == 701 and r["in_road"] == 702]
        assert len(tri) == 1, (variant, rows)
        r = tri[0]
        assert (r["node_id"], r["nb_id"], r["apex_id"]) == (0, 1, 1000), variant
        assert r["warning"] == want, (variant, r["warning"])

    # only the SHORTER roundabout segment checks the flare: no checked
    # candidate with n=1, nb=0 (reverse walk length 300 >= 100)
    arcs = spark.createDataFrame(_flare_graph("good"), schema)
    rows = check_roundabout_flares(arcs).collect()
    assert not [r for r in rows if r["node_id"] == 1 and r["nb_id"] == 0]

    # continuation past the apex
    arcs = spark.createDataFrame(_flare_graph("out-continues"), schema)
    rows = check_roundabout_flares(arcs).collect()
    tri = [r for r in rows if r["out_road"] == 701 and r["in_road"] == 702]
    assert tri and tri[0]["warning"] == "outgoing-continues-past-flare"

    # max_flare_length_ratio filters long pseudo-flares (flare len 50,
    # segment 100: ratio 1 -> max 100 >= 50 keeps; shrink segment by a
    # bigger ratio test: ratio such that both flare roads exceed)
    rows = check_roundabout_flares(
        spark.createDataFrame(_flare_graph("good"), schema), max_flare_length_ratio=0
    ).collect()
    assert [r for r in rows if r["out_road"] == 701 and r["in_road"] == 702]


def test_roundabout_flare_walk_paths_agree(spark):
    """The above-cap iterative hop-join walk must produce exactly the
    rows of the default driver dict walk (same graphs as the main
    test, including a larger ring so the walk takes several hops)."""
    from mkgmap_spark.operators.flares import check_roundabout_flares

    schema = (
        "from_id long, to_id long, road_id long, roundabout boolean, "
        "oneway boolean, forward boolean, length long, flare_check boolean, "
        "synthesised boolean"
    )
    cap_conf = "spark.mkgmap.flares.driverWalkCap"
    cases = [("good", 4, None), ("out-backward", 9, None), ("out-continues", 6, None)]
    # a NULL length on a ring arc: the driver path must hand off to the
    # null-propagating iterative walk (not crash, not corrupt), so both
    # invocations agree trivially — and still emit the flare triangle
    cases.append(("good", 4, "null-length"))
    for variant, ring, twist in cases:
        graph = _flare_graph(variant, ring=ring)
        if twist == "null-length":
            f, t, road, rab, ow, fwd, ln, fc, syn = graph[2]
            graph[2] = (f, t, road, rab, ow, fwd, None, fc, syn)
        arcs = spark.createDataFrame(graph, schema)
        driver_rows = sorted(map(tuple, check_roundabout_flares(arcs).collect()))
        old = spark.conf.get(cap_conf, None)
        spark.conf.set(cap_conf, "0")  # force the iterative fallback
        try:
            iter_rows = sorted(map(tuple, check_roundabout_flares(arcs).collect()))
        finally:
            if old is None:
                spark.conf.unset(cap_conf)
            else:
                spark.conf.set(cap_conf, old)
        assert driver_rows == iter_rows, (variant, ring, twist)
        assert driver_rows, (variant, ring, twist)
