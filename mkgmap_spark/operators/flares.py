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

from ..plans.materialize import materialize, materialize_counted

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

    # per-node marks (checkRoundaboutFlares:560-571): one aggregation
    # pass computes the connects-non-roundabout flag and the single
    # forward roundabout successor (same grouping key: the node).  A
    # second union stream tags every node that is the TARGET of a
    # forward roundabout arc — together with the successor sources,
    # exactly the set of nodes either walk can ever visit — so the
    # driver fast path below collects only the walk graph, not every
    # junction of the map.
    ns = a.filter(~F.col("synthesised"))
    marks, n_marks = materialize_counted(
        ns.select(
            F.col("from_id").alias("node"),
            "roundabout", "forward", "road_id", "to_id", "length",
            F.lit(False).alias("_is_target"),
        )
        .unionByName(
            ns.filter(F.col("roundabout") & F.col("forward")).select(
                F.col("to_id").alias("node"),
                "roundabout", "forward", "road_id", "to_id", "length",
                F.lit(True).alias("_is_target"),
            )
        )
        .groupBy(F.col("node").alias("from_id"))
        .agg(
            F.max(
                F.when(~F.col("_is_target") & ~F.col("roundabout"), F.lit(True))
            ).alias("_conn"),
            F.min(
                F.when(
                    ~F.col("_is_target") & F.col("roundabout") & F.col("forward"),
                    F.struct("road_id", "to_id", "length"),
                )
            ).alias("_n"),
            F.max(F.when(F.col("_is_target"), F.lit(True))).alias("_tgt"),
        )
    )
    walk_rows = F.col("_n").isNotNull() | F.col("_tgt").isNotNull()

    # The walk graph (successor sources + their targets) is bounded by
    # the roundabout-node count — a tiny fraction of any map — and the
    # iterative fallback used to broadcast it whole on every hop, so
    # whenever it is broadcast-sized it is equally driver-sized: both
    # walks collapse into dict chases on the driver (the quadtree split
    # uses the same bounded-collect pattern).  One collect job replaces
    # ~2 jobs per hop x 2 walks.  The cap keeps the collect honest: the
    # total marks count gates for free; above it one cheap count of the
    # filtered walk rows decides, and only a genuinely huge walk graph
    # falls back to the hop-joined walk (which no longer broadcasts —
    # that would be equally unsafe there).
    cap = int(spark.conf.get("spark.mkgmap.flares.driverWalkCap", "5000000"))
    n_walk = n_marks if n_marks <= cap else marks.filter(walk_rows).count()
    pair_rows = (
        _walk_on_driver(marks.filter(walk_rows), max_hops)
        if n_walk <= cap
        else None
    )
    if pair_rows is not None:
        # checkpoint the local rows before broadcasting: embedding the
        # local relation directly in the plan made the downstream join
        # stage noticeably slower on its first (only, in a bench run)
        # execution; the checkpointed form matches the join shape the
        # hop-joined version always had
        pairs = F.broadcast(
            materialize(
                spark.createDataFrame(
                    pair_rows, schema="n long, nb long, seg_fw long"
                )
            )
        )
    else:
        pairs = _walk_iterative(marks, max_hops).transform(materialize)

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


def _walk_on_driver(
    marks: DataFrame, max_hops: int
) -> list[tuple[int, int, int]] | None:
    """Both roundabout walks as driver dict chases over the collected
    walk-graph rows.  Exact mirror of the hop-joined form: walk 1
    settles a start node on the FIRST successor (checked after
    1..max_hops advancements) that connects a non-roundabout segment,
    dies on dead ends and on returning to the start; walk 2 accumulates
    nb -> n and leaves seg_bw unset (pair still checks) when
    unreachable within the cap.  Returns the shorter-segment pairs
    (n, nb, seg_fw) — or None when a null id/length appears (the
    nullable->float64 pandas round-trip would corrupt them; the caller
    then runs the null-propagating iterative walk instead)."""
    pdf = marks.select(
        # coalesce keeps every collected column a NON-NULL long, so
        # pandas dtypes stay exact int64 (no float64 detour); the
        # `bad` flag routes genuinely-null ids/lengths to the fallback
        F.coalesce("from_id", F.lit(0)).alias("from_id"),
        F.col("_conn").isNotNull().alias("conn"),
        F.col("_n").isNotNull().alias("has_nxt"),
        F.coalesce(F.col("_n.to_id"), F.lit(0)).alias("nxt"),
        F.coalesce(F.col("_n.length"), F.lit(0)).alias("nxt_len"),
        (
            F.col("from_id").isNull()
            | (
                F.col("_n").isNotNull()
                & (F.col("_n.to_id").isNull() | F.col("_n.length").isNull())
            )
        ).alias("bad"),
    ).toPandas()
    if bool(pdf["bad"].any()):
        return None
    conn = set(pdf.loc[pdf["conn"], "from_id"].tolist())
    has_nxt = pdf["has_nxt"]
    nxt = dict(
        zip(
            pdf.loc[has_nxt, "from_id"].tolist(),
            zip(
                pdf.loc[has_nxt, "nxt"].tolist(),
                pdf.loc[has_nxt, "nxt_len"].tolist(),
            ),
        )
    )

    rows: list[tuple[int, int, int]] = []
    for start, (cur, seg) in nxt.items():
        settled = None
        for _ in range(max_hops):
            if cur in conn:
                settled = (cur, seg)
                break
            step = nxt.get(cur)
            if step is None:
                break
            cur2 = step[0]
            if cur2 == start:
                break
            seg += step[1]
            cur = cur2
        if settled is None:
            continue
        nb, seg_fw = settled
        # walk 2: roundaboutSegmentLength(nb, n) (RouteNode:505-527)
        seg_bw = None
        step = nxt.get(nb)
        if step is not None:
            cur, acc = step
            for _ in range(max_hops):
                if cur == start:
                    seg_bw = acc
                    break
                step = nxt.get(cur)
                if step is None:
                    break
                acc += step[1]
                cur = step[0]
        # only the shorter roundabout segment checks its flare (:610-612)
        if seg_bw is None or seg_fw < seg_bw:
            rows.append((start, nb, seg_fw))
    return rows


def _walk_iterative(marks: DataFrame, max_hops: int) -> DataFrame:
    """Hop-joined walk fallback for above-cap graphs: bounded iterative
    equi-joins, frontier materialized per hop, the loop-invariant marks
    streamed from their checkpoint (same shape as the coastline
    component propagation).  Returns (n, nb, seg_fw)."""
    connects = marks.filter(F.col("_conn").isNotNull()).select(
        F.col("from_id").alias("node"), "_conn"
    )
    next_rab = marks.filter(F.col("_n").isNotNull()).select(
        F.col("from_id").alias("node"),
        F.col("_n.to_id").alias("nxt"),
        F.col("_n.length").alias("nxt_len"),
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
            connects, frontier["cur"] == connects["node"], "left"
        ).drop("node")
        done = fr.filter(F.col("_conn").isNotNull()).select(
            "start", F.col("cur").alias("nb"), "seg"
        )
        settled = done if settled is None else settled.unionByName(done)
        rest = fr.filter(F.col("_conn").isNull()).drop("_conn")
        # dead ends drop in the inner join; loops back to start drop.
        # materialize_counted: the lineage cut and the termination test
        # share one driver action per hop
        frontier, n_left = materialize_counted(
            rest.join(next_rab, rest["cur"] == next_rab["node"])
            .select(
                "start",
                F.col("nxt").alias("cur"),
                (F.col("seg") + F.col("nxt_len")).alias("seg"),
            )
            .filter(F.col("cur") != F.col("start"))
        )
        if n_left == 0:
            break
    settled = (settled if settled is not None else frontier.limit(0)).transform(materialize)

    # walk 2: roundaboutSegmentLength(nb, n) (RouteNode:505-527) —
    # forward roundabout walk from nb until n; unreachable/hop-capped
    # pairs keep seg_bw null (= MAX_VALUE: the pair still checks)
    pair0 = settled.select(
        F.col("start").alias("n"), "nb", F.col("seg").alias("seg_fw")
    )
    rev = pair0.join(next_rab, pair0["nb"] == next_rab["node"]).select(
        "n", "nb", F.col("nxt").alias("cur"), F.col("nxt_len").alias("acc")
    )
    rev_done = None
    for _ in range(max_hops):
        hit = rev.filter(F.col("cur") == F.col("n")).select("n", "nb", F.col("acc").alias("seg_bw"))
        rev_done = hit if rev_done is None else rev_done.unionByName(hit)
        rest = rev.filter(F.col("cur") != F.col("n"))
        rev, n_left = materialize_counted(
            rest.join(next_rab, rest["cur"] == next_rab["node"])
            .select(
                "n", "nb",
                F.col("nxt").alias("cur"),
                (F.col("acc") + F.col("nxt_len")).alias("acc"),
            )
        )
        if n_left == 0:
            break
    pairs = pair0.join(
        rev_done if rev_done is not None else pair0.limit(0).select("n", "nb", F.lit(0).alias("seg_bw")),
        ["n", "nb"],
        "left",
    )
    # only the shorter roundabout segment checks its flare (:610-612)
    return pairs.filter(
        F.col("seg_bw").isNull() | (F.col("seg_fw") < F.col("seg_bw"))
    ).select("n", "nb", "seg_fw")
