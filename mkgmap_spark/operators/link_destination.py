"""Destination / exit hints on motorway link roads (the full
LinkDestinationHook pipeline).

Reference: reader/osm/LinkDestinationHook.java —

1. tag selection (retrieveWays:94-162): a link way's hint text comes
   from ``destination``, else ``destination:lanes`` when it carries no
   lane-specific '|', else the oneway-directed
   ``destination:lanes:forward/backward`` (again no '|'), else
   ``destination:forward/backward``, else ``destination:street``;
2. chain dedup (processWays:452-492): a link way whose FIRST point is
   the drive-exit point of another link way with the SAME hint is
   dropped (the upstream link already announces it) — note the
   upstream way may itself have been dropped, the reference iterates
   the original queue, so the rule is a plain self-join, no fixpoint;
3. way splitting (cutoffWay:260-360): each remaining oneway,
   non-via link splits into up to three parts — an approach part
   (cut at min(len/2, 20 m), or at the existing second point when its
   first segment is <= min(len, 100 m)), a HINT part carrying
   ``mkgmap:dest_hint`` (a further 10/50 m cut when > 50 m remains),
   and the rest; ways under 10 m get no hint at all;
4. exits (processWays:494-624): ``highway=motorway_junction`` nodes
   sitting on a real highway way mark their adjacent oneway link ways
   with ``mkgmap:exit_hint`` (+ ref / name, and exit_to only when the
   highway continues on exactly one neighbour), split the same way.

Spark re-expression: the tag ladder and chain dedup are pure Column
expressions + one self-join on the (exit point = first point) key; the
3-part cut runs as a per-way Arrow kernel (mapInPandas — each way is a
few points, thousands of ways per batch); exits are an exploded
point-equi-join between junction nodes and highway way points.

Documented divergences: the reference nudges an inserted cut point by
<= 1 map unit when interpolation flips its angular orientation to the
next highway node (cutoffWay:310-335) — a sub-unit rendering nicety
this kernel skips; restriction-relation membership rewriting on split
(changeWayIdInRelations) is the caller's concern in the table model
(part rows keep the original way id + part index).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.materialize import materialize

LINK_TYPES = (
    "motorway_link", "trunk_link", "primary_link", "secondary_link", "tertiary_link"
)
HIGHWAY_TYPES = (
    "motorway", "trunk", "primary", "secondary", "tertiary",
) + LINK_TYPES

_M_PER_UNIT = 2.0 * math.pi * 6378137.0 / (1 << 24)


def _t(key: str):
    return F.col("tags").getItem(key)


def _no_pipe(col):
    return col.isNotNull() & ~col.contains("|")


def select_dest_hint(ways: DataFrame) -> DataFrame:
    """Add ``dest_hint`` (the hint-text ladder), ``is_link``,
    ``fwd_oneway``, ``rev_oneway`` columns.  ways: (id, tags, lats,
    lons)."""
    fwd = _t("oneway").isin("yes", "true", "1")
    rev = _t("oneway").isin("-1", "reverse")
    lanes = _t("destination:lanes")
    lanes_dir = F.when(fwd, _t("destination:lanes:forward")).when(
        rev, _t("destination:lanes:backward")
    )
    directed = F.when(fwd, _t("destination:forward")).when(
        rev, _t("destination:backward")
    )
    dest = (
        F.coalesce(
            _t("destination"),
            F.when(_no_pipe(lanes), lanes),
            F.when(_no_pipe(lanes_dir), lanes_dir),
            directed,
            _t("destination:street"),
        )
    )
    return ways.withColumns(
        {
            "is_link": _t("highway").isin(*LINK_TYPES),
            "fwd_oneway": F.coalesce(fwd, F.lit(False)),
            "rev_oneway": F.coalesce(rev, F.lit(False)),
            "dest_hint": F.when(_t("highway").isin(*LINK_TYPES), dest),
        }
    )


def dedup_chain_hints(links: DataFrame) -> DataFrame:
    """Drop link ways announced by an upstream same-hint link
    (processWays:459-492).  links: output of select_dest_hint filtered
    to is_link & dest_hint non-null."""
    exit_pt = F.when(
        F.col("rev_oneway"),
        F.struct(F.expr("lats[0]").alias("y"), F.expr("lons[0]").alias("x")),
    ).otherwise(
        F.struct(
            F.expr("lats[size(lats) - 1]").alias("y"),
            F.expr("lons[size(lons) - 1]").alias("x"),
        )
    )
    ups = links.select(
        F.col("id").alias("_uid"),
        F.col("dest_hint").alias("_udest"),
        exit_pt.alias("_uexit"),
    )
    start_pt = F.struct(F.expr("lats[0]").alias("y"), F.expr("lons[0]").alias("x"))
    with_start = links.withColumn("_start", start_pt)
    # a reverse-oneway way cannot be ENTERED at its first point, so it
    # never registers there (retrieveWays:100-110) and is kept
    dropped = with_start.join(
        ups,
        (F.col("_start") == F.col("_uexit"))
        & (F.col("id") != F.col("_uid"))
        & (F.col("dest_hint") == F.col("_udest"))
        & ~F.col("rev_oneway"),
        "left_semi",
    ).select("id")
    return links.join(dropped, "id", "left_anti")


def _cutoff(pts: list, cut_len: float, max_len: float, m_per_unit: float):
    """cutoffWay:260-360 — returns (part, rest) or None."""
    if len(pts) < 2:
        return None
    if len(pts) >= 3:
        d = math.dist(pts[0], pts[1]) * m_per_unit
        if d <= max_len:
            return [pts[0], pts[1]], pts[1:]
    acc = 0.0
    for i in range(1, len(pts)):
        seg = math.dist(pts[i - 1], pts[i]) * m_per_unit
        if acc + seg >= cut_len:
            frac = (cut_len - acc) / seg if seg > 0 else 0.0
            cy = int(pts[i - 1][0] + (pts[i][0] - pts[i - 1][0]) * frac)
            cx = int(pts[i - 1][1] + (pts[i][1] - pts[i - 1][1]) * frac)
            cpt = (cy, cx)
            part = pts[:i] + [cpt]
            rest = [cpt] + pts[i:]
            return part, rest
        acc += seg
    return None


def split_hint_parts(pts: list, m_per_unit: float = _M_PER_UNIT):
    """The 3-part split (processWays:565-705): list of (role, points)
    with roles 'approach' / 'hint' / 'rest'; [] when too short."""
    total = sum(
        math.dist(pts[i - 1], pts[i]) * m_per_unit for i in range(1, len(pts))
    )
    if total < 10:
        return []
    cut1 = min(total / 2, 20.0)
    cut2 = min(total, 100.0)
    r = _cutoff(pts, cut1, cut2, m_per_unit)
    if r is None:
        return []
    part1, rest = r
    out = [("approach", part1)]
    if total > 50:
        r2 = _cutoff(rest, 10.0, 50.0, m_per_unit)
        if r2 is None:
            out.append(("rest", rest))
            return out
        hint, rest2 = r2
        out.append(("hint", hint))
        out.append(("rest", rest2))
    else:
        out.append(("hint", rest))
    return out


def split_hint_ways(links: DataFrame, metric: str = "equirect") -> DataFrame:
    """Split every eligible link into approach/hint/rest part rows.

    links: (id, lats, lons, dest_hint) oneway non-via links.  Output:
    (id, part, role, lats, lons, dest_hint) — dest_hint only on the
    'hint' row."""
    mpu = _M_PER_UNIT if metric == "equirect" else 1.0

    def kernel(it):
        for pdf in it:
            ids, parts, roles, lats, lons, hints = [], [], [], [], [], []
            for r in pdf.itertuples():
                pts = list(zip(r.lats, r.lons))
                for part_idx, (role, ppts) in enumerate(split_hint_parts(pts, mpu)):
                    ids.append(int(r.id))
                    parts.append(part_idx)
                    roles.append(role)
                    lats.append([int(p[0]) for p in ppts])
                    lons.append([int(p[1]) for p in ppts])
                    hints.append(r.dest_hint if role == "hint" else None)
            yield pd.DataFrame(
                {
                    "id": ids, "part": parts, "role": roles,
                    "lats": lats, "lons": lons, "dest_hint": hints,
                }
            )

    # spread the per-way Python kernel across all cores — the input
    # often arrives with the source file's (low) partition count
    par = links.sparkSession.sparkContext.defaultParallelism
    return (
        links.select("id", "lats", "lons", "dest_hint")
        .repartition(par)
        .mapInPandas(
            kernel,
            "id long, part int, role string, lats array<int>, lons array<int>, "
            "dest_hint string",
        )
    )


def exit_hints(
    ways: DataFrame,
    nodes: DataFrame,
) -> DataFrame:
    """Exit hints (processWays:494-624).

    ways: (id, tags, lats, lons) with highway tags; nodes: (node_id,
    tags, lat, lon).  Output: one row per (exit node, link way) with
    the hint attributes the split's 'hint' part carries:
    (node_id, way_id, exit_hint, exit_hint_ref, exit_hint_exit_to,
    exit_hint_name)."""
    w = select_dest_hint(ways)
    exits = nodes.filter(
        F.col("tags").getItem("highway") == "motorway_junction"
    ).select(
        "node_id",
        F.col("tags").getItem("ref").alias("ref"),
        F.col("tags").getItem("exit_to").alias("exit_to"),
        F.coalesce(
            F.col("tags").getItem("name"), F.col("tags").getItem("ref")
        ).alias("name"),
        F.col("lat"), F.col("lon"),
    )
    # way points exploded once, for both location + adjacency joins
    pts = w.filter(_t("highway").isin(*HIGHWAY_TYPES)).select(
        "id",
        _t("highway").alias("hw"),
        "is_link", "fwd_oneway", "rev_oneway", "dest_hint",
        F.posexplode(F.arrays_zip("lats", "lons")).alias("pos", "p"),
        F.expr("size(lats)").alias("n"),
    ).select(
        "id", "hw", "is_link", "fwd_oneway", "rev_oneway", "dest_hint",
        "pos", "n",
        F.col("p.lats").alias("y"), F.col("p.lons").alias("x"),
    )
    # the exit node must sit on a non-link highway; ties resolve by the
    # reference's fixed type order (motorway first)
    prio = F.array(*[F.lit(t) for t in HIGHWAY_TYPES])
    on_hw = (
        exits.join(pts, (F.col("lat") == F.col("y")) & (F.col("lon") == F.col("x")))
        .withColumn("_prio", F.array_position(prio, F.col("hw")))
        .groupBy("node_id")
        .agg(F.min("_prio").alias("_bestprio"))
        .withColumn("expected_hw", prio[(F.col("_bestprio") - 1).cast("int")])
    )
    located = exits.join(on_hw, "node_id")
    # countMatches: neighbour points on ways carrying the expected tag
    # (getNextNodes + the countMatches > 1 suppression, :540-553)
    neigh = located.join(
        pts, (F.col("lat") == F.col("y")) & (F.col("lon") == F.col("x")) & (F.col("hw") == F.col("expected_hw"))
    ).select(
        "node_id",
        (F.when(F.col("pos") > 0, 1).otherwise(0)
         + F.when(F.col("pos") < F.col("n") - 1, 1).otherwise(0)).alias("_nn"),
    ).groupBy("node_id").agg(F.sum("_nn").alias("count_matches"))
    located = located.join(neigh, "node_id", "left")

    # adjacent link ways: drivable-from registration excludes the last
    # point of a forward oneway and the first of a reverse oneway
    drivable = pts.filter(
        F.col("is_link")
        & ~(F.col("fwd_oneway") & (F.col("pos") == F.col("n") - 1))
        & ~(F.col("rev_oneway") & (F.col("pos") == 0))
    )
    linked = located.join(
        drivable, (F.col("lat") == F.col("y")) & (F.col("lon") == F.col("x"))
    ).filter(F.col("fwd_oneway") | F.col("rev_oneway"))  # isNotOneway skip
    return linked.select(
        "node_id",
        F.col("id").alias("way_id"),
        F.lit(True).alias("exit_hint"),
        F.col("ref").alias("exit_hint_ref"),
        F.when(F.col("count_matches") == 1, F.col("exit_to")).alias(
            "exit_hint_exit_to"
        ),
        F.col("name").alias("exit_hint_name"),
        "dest_hint",
    ).dropDuplicates(["node_id", "way_id"])


def process_link_destinations(
    ways: DataFrame,
    nodes: DataFrame | None = None,
    metric: str = "equirect",
) -> DataFrame:
    """process-destination end-to-end: ladder -> chain dedup ->
    oneway/link filter -> 3-part split.  ways: (id, tags, lats, lons).
    Output: the split part rows of every hinted link.

    With ``nodes`` (process-exits alongside): exit-adjacent link ways
    are handled by the EXIT path and removed from plain destination
    processing first (the reference's
    ``destinationLinkWays.remove(w.getId())`` inside the exit loop,
    processWays:556) — their split rows carry the exit-hint attributes
    on the 'hint' part instead."""
    w = select_dest_hint(ways)
    # materialize once: the dedup self-join references the ladder
    # output three times (upstream side, start side, anti-join back)
    # and the split consumes it again — without a checkpoint the whole
    # ladder lineage recomputes per reference (measured ~4x the work)
    links = (
        w.filter(F.col("is_link") & F.col("dest_hint").isNotNull()).transform(materialize)
    )
    exit_rows = None
    if nodes is not None:
        exit_rows = materialize(exit_hints(ways, nodes))
        links = links.join(
            exit_rows.select(F.col("way_id").alias("id")).distinct(), "id", "left_anti"
        )
    links = dedup_chain_hints(links)
    links = links.filter(F.col("fwd_oneway") | F.col("rev_oneway")).transform(materialize)
    parts = split_hint_ways(links, metric=metric)
    if exit_rows is None:
        return parts

    # exit-adjacent oneway links split the same way, their 'hint' part
    # tagged with the exit attributes (processWays:569-616)
    exit_links = (
        select_dest_hint(ways)
        .join(exit_rows.select(F.col("way_id").alias("id")).distinct(), "id")
        .filter(F.col("is_link") & (F.col("fwd_oneway") | F.col("rev_oneway")))
    )
    exit_parts = split_hint_ways(exit_links, metric=metric)
    attrs = exit_rows.select(
        F.col("way_id").alias("id"), "exit_hint_ref", "exit_hint_exit_to",
        "exit_hint_name",
    ).dropDuplicates(["id"])
    exit_parts = exit_parts.join(attrs, "id", "left").select(
        "id", "part", "role", "lats", "lons", "dest_hint",
        F.when(F.col("role") == "hint", F.lit(True)).alias("exit_hint"),
        F.when(F.col("role") == "hint", F.col("exit_hint_ref")).alias("exit_hint_ref"),
        F.when(F.col("role") == "hint", F.col("exit_hint_exit_to")).alias("exit_hint_exit_to"),
        F.when(F.col("role") == "hint", F.col("exit_hint_name")).alias("exit_hint_name"),
    )
    plain = parts.select(
        "id", "part", "role", "lats", "lons", "dest_hint",
        F.lit(None).cast("boolean").alias("exit_hint"),
        F.lit(None).cast("string").alias("exit_hint_ref"),
        F.lit(None).cast("string").alias("exit_hint_exit_to"),
        F.lit(None).cast("string").alias("exit_hint_name"),
    )
    return plain.unionByName(exit_parts)
