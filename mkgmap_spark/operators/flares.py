"""Roundabout flare-road sanity checks.

Reference: imgfmt/app/net/RouteNode.checkRoundaboutFlares:535-657
(driven per node after NOD graph construction; flare eligibility set by
StyledConverter:1857-1875 — roundabout and synthesised roads never
flare-check, mkgmap:flare-check overrides).  A "flare" is the triangle
of two short one-way roads connecting a two-way road to two adjacent
roundabout nodes; the checks flag flares whose one-way direction is
wrong, that are not one-way at all, or that continue past the triangle
apex.

Spark re-expression over an arcs TABLE (the routing-graph form of
RouteNode.arcs — one row per directed adjacency):

1. per-node marks: ``connects_non_rab`` (any direct non-synthesised
   non-roundabout arc) and the single forward roundabout successor
   (``next_rab``; the reference takes the last forward roundabout arc
   in its arc list — an arbitrary order — the engine picks the
   (road_id, to_id)-smallest for determinism, divergence documented);
2. the walk from every roundabout node to the next node that connects
   a non-roundabout segment is a bounded ITERATIVE JOIN over next_rab
   (frontier settles or dies per round; rounds <= the longest
   roundabout chain, hop-capped) — same shape as the coastline
   component propagation, no driver-side graph;
3. the reverse roundabout segment length (nb -> n) is a second walk
   keyed by the settled pair;
4. flare candidates are an equi-join: arcs from n x arcs from nb on a
   shared destination (the triangle apex), both flare-checkable;
5. the warning ladder (wrong direction out/in, not oneway out/in,
   continues-past-apex) is a single CASE expression; the
   shorter-segment rule and the max-flare-length-ratio filter are
   plain column predicates.

Output: one row per CHECKED flare triangle with ``warning`` (null =
flare is fine) — the reference logs only the warnings; emitting the
checked set keeps the operator oracle-testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.materialize import materialize

WARN_OUT_DIR = "outgoing-wrong-direction"
WARN_IN_DIR = "incoming-wrong-direction"
WARN_OUT_ONEWAY = "outgoing-not-oneway"
WARN_IN_ONEWAY = "incoming-not-oneway"
WARN_OUT_CONT = "outgoing-continues-past-flare"
WARN_IN_CONT = "incoming-continues-past-flare"


def check_roundabout_flares(
    arcs: DataFrame,
    max_flare_length_ratio: int = 0,
    max_hops: int = 64,
) -> DataFrame:
    """arcs: (from_id, to_id, road_id, roundabout, oneway, forward,
    length, flare_check, synthesised) — one row per directed adjacency.

    Returns (node_id, nb_id, apex_id, out_road, in_road, warning).
    """
    spark = arcs.sparkSession
    a = arcs.select(
        "from_id", "to_id", "road_id", "roundabout", "oneway", "forward",
        F.col("length").cast("long").alias("length"), "flare_check", "synthesised",
    ).transform(materialize)

    # per-node marks (checkRoundaboutFlares:560-571).  Both marks are
    # loop-invariant: materialize them once (connects used to re-run
    # its distinct aggregation on every hop) and broadcast them in the
    # walk joins so the shrinking frontier is never shuffled — each hop
    # becomes a scan of the frontier checkpoint + two broadcast hash
    # joins with zero exchanges.  Broadcast safety: both tables are
    # bounded by the roundabout-node count, a tiny fraction of any map.
    connects = (
        a.filter(~F.col("synthesised") & ~F.col("roundabout"))
        .select(F.col("from_id").alias("node"))
        .distinct()
        .withColumn("_conn", F.lit(True))
        .transform(materialize)
    )
    next_rab = (
        a.filter(F.col("roundabout") & F.col("forward") & ~F.col("synthesised"))
        .groupBy("from_id")
        .agg(F.min(F.struct("road_id", "to_id", "length")).alias("_n"))
        .select(
            F.col("from_id").alias("node"),
            F.col("_n.to_id").alias("nxt"),
            F.col("_n.length").alias("nxt_len"),
        )
        .transform(materialize)
    )

    # walk 1: n -> first node connecting a non-roundabout segment
    frontier = next_rab.select(
        F.col("node").alias("start"),
        F.col("nxt").alias("cur"),
        F.col("nxt_len").alias("seg"),
    )
    settled = None
    for _ in range(max_hops):
        fr = frontier.join(
            F.broadcast(connects), frontier["cur"] == connects["node"], "left"
        ).drop("node")
        done = fr.filter(F.col("_conn").isNotNull()).select(
            "start", F.col("cur").alias("nb"), "seg"
        )
        settled = done if settled is None else settled.unionByName(done)
        rest = fr.filter(F.col("_conn").isNull()).drop("_conn")
        # dead ends drop in the inner join; loops back to start drop
        frontier = (
            rest.join(F.broadcast(next_rab), rest["cur"] == next_rab["node"])
            .select(
                "start",
                F.col("nxt").alias("cur"),
                (F.col("seg") + F.col("nxt_len")).alias("seg"),
            )
            .filter(F.col("cur") != F.col("start"))
            .transform(materialize)
        )
        if frontier.isEmpty():
            break
    settled = (settled if settled is not None else frontier.limit(0)).transform(materialize)

    # walk 2: roundaboutSegmentLength(nb, n) (RouteNode:505-527) —
    # forward roundabout walk from nb until n; unreachable/hop-capped
    # pairs keep seg_bw null (= MAX_VALUE: the pair still checks)
    pair0 = settled.select(
        F.col("start").alias("n"), "nb", F.col("seg").alias("seg_fw")
    )
    rev = pair0.join(F.broadcast(next_rab), pair0["nb"] == next_rab["node"]).select(
        "n", "nb", F.col("nxt").alias("cur"), F.col("nxt_len").alias("acc")
    )
    rev_done = None
    for _ in range(max_hops):
        hit = rev.filter(F.col("cur") == F.col("n")).select("n", "nb", F.col("acc").alias("seg_bw"))
        rev_done = hit if rev_done is None else rev_done.unionByName(hit)
        rest = rev.filter(F.col("cur") != F.col("n"))
        rev = (
            rest.join(F.broadcast(next_rab), rest["cur"] == next_rab["node"])
            .select(
                "n", "nb",
                F.col("nxt").alias("cur"),
                (F.col("acc") + F.col("nxt_len")).alias("acc"),
            )
            .transform(materialize)
        )
        if rev.isEmpty():
            break
    pairs = pair0.join(
        rev_done if rev_done is not None else pair0.limit(0).select("n", "nb", F.lit(0).alias("seg_bw")),
        ["n", "nb"],
        "left",
    )
    # only the shorter roundabout segment checks its flare (:610-612)
    pairs = pairs.filter(
        F.col("seg_bw").isNull() | (F.col("seg_fw") < F.col("seg_bw"))
    ).transform(materialize)

    flare = a.filter(F.col("flare_check"))
    fa = flare.select(
        F.col("from_id").alias("n"), F.col("to_id").alias("apex"),
        F.col("road_id").alias("out_road"), F.col("forward").alias("out_fwd"),
        F.col("oneway").alias("out_oneway"), F.col("length").alias("out_len"),
    )
    fb = flare.select(
        F.col("from_id").alias("nb"), F.col("to_id").alias("apex"),
        F.col("road_id").alias("in_road"), F.col("forward").alias("in_fwd"),
        F.col("oneway").alias("in_oneway"), F.col("length").alias("in_len"),
    )
    tri = pairs.join(fa, "n").join(fb, ["nb", "apex"])
    if max_flare_length_ratio > 0:
        max_len = F.col("seg_fw") * max_flare_length_ratio
        tri = tri.filter(
            ~((max_len > 0) & (F.col("out_len") > max_len) & (F.col("in_len") > max_len))
        )

    # continuation past the apex (:646-655): an arc at the apex on the
    # same road to a third node
    cont = a.select(
        F.col("from_id").alias("apex"), F.col("to_id").alias("other"),
        F.col("road_id").alias("cont_road"),
    )
    out_cont = (
        tri.join(
            cont,
            (tri["apex"] == cont["apex"])
            & (cont["other"] != tri["n"]) & (cont["other"] != tri["nb"])
            & (cont["cont_road"] == tri["out_road"]),
            "left_semi",
        )
        .select("n", "nb", "apex", "out_road")
        .distinct()
        .withColumn("_oc", F.lit(True))
    )
    in_cont = (
        tri.join(
            cont,
            (tri["apex"] == cont["apex"])
            & (cont["other"] != tri["n"]) & (cont["other"] != tri["nb"])
            & (cont["cont_road"] == tri["in_road"]),
            "left_semi",
        )
        .select("n", "nb", "apex", "in_road")
        .distinct()
        .withColumn("_ic", F.lit(True))
    )
    tri = tri.join(out_cont, ["n", "nb", "apex", "out_road"], "left").join(
        in_cont, ["n", "nb", "apex", "in_road"], "left"
    )

    warning = (
        F.when(~F.col("out_fwd"), WARN_OUT_DIR)
        .when(F.col("in_fwd"), WARN_IN_DIR)
        .when(~F.col("out_oneway"), WARN_OUT_ONEWAY)
        .when(~F.col("in_oneway"), WARN_IN_ONEWAY)
        .when(F.col("_oc").isNotNull(), WARN_OUT_CONT)
        .when(F.col("_ic").isNotNull(), WARN_IN_CONT)
        .otherwise(F.lit(None).cast("string"))
    )
    return tri.select(
        F.col("n").alias("node_id"),
        F.col("nb").alias("nb_id"),
        F.col("apex").alias("apex_id"),
        "out_road",
        "in_road",
        warning.alias("warning"),
    )
