"""Line merging and shape merging.

Reference semantics:
- LineMergeFilter (filters/LineMergeFilter.java:59-118): polylines of
  the same type/name that share endpoints are concatenated (per
  resolution).  The reference scans lines keeping startPoints/endPoints
  multimaps.
- RoadMerger (osmstyle/RoadMerger.java:45-110): same idea with a
  15-attribute equality key.
- ShapeMergeFilter (filters/ShapeMergeFilter.java:56-93): polygons of
  the same type sharing points are merged.

Spark re-expression: merging is connected components over the
"shares an endpoint" graph *within a (group key) partition*:

  groupBy(merge_key) -> applyInPandas(endpoint union-find kernel)

Each group is one type/name class — small in practice (mkgmap merges
per tile); the union-find is vectorized numpy over the packed endpoint
arrays.  Output keeps one row per merged chain with the member ids and
the stitched point count, which is what the tiling size estimator
needs; full coordinate stitching follows the same chain order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _union_find_chains(ids, y0, x0, y1, x1):
    """Union-find over shared endpoints. Returns root label per line."""
    n = len(ids)
    parent = np.arange(n)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    # endpoint -> first line seen there
    seen: dict[tuple[int, int], int] = {}
    for i in range(n):
        for pt in ((y0[i], x0[i]), (y1[i], x1[i])):
            j = seen.get(pt)
            if j is None:
                seen[pt] = i
            else:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[ri] = rj
    return np.array([find(i) for i in range(n)])


def merge_lines(
    lines: DataFrame,
    key_cols: list[str],
    id_col: str = "id",
) -> DataFrame:
    """Merge chains of lines sharing endpoints within each key group.

    Input needs packed coords (lats, lons).  Output: one row per merged
    chain: key cols + chain_id (min member id), member_ids (sorted),
    n_members, total_points (stitched: shared endpoints counted once).
    """
    prepared = lines.select(
        *key_cols,
        F.col(id_col).alias("id"),
        F.expr("lats[0]").alias("y0"),
        F.expr("lons[0]").alias("x0"),
        F.expr("lats[size(lats) - 1]").alias("y1"),
        F.expr("lons[size(lons) - 1]").alias("x1"),
        F.size("lats").alias("npts"),
    )

    out_schema = (
        ", ".join(f"{c} string" for c in key_cols)
        + ", chain_id long, member_ids array<bigint>, n_members int, total_points int"
    )

    def kernel(key, pdf):
        from collections import Counter

        ids = pdf["id"].to_numpy(np.int64)
        y0 = pdf["y0"].to_numpy(np.int64)
        x0 = pdf["x0"].to_numpy(np.int64)
        y1 = pdf["y1"].to_numpy(np.int64)
        x1 = pdf["x1"].to_numpy(np.int64)
        roots = _union_find_chains(ids, y0, x0, y1, x1)
        npts = pdf["npts"].to_numpy(np.int64)
        rows = []
        for r in np.unique(roots):
            m = np.flatnonzero(roots == r)
            members = np.sort(ids[m])
            # stitched point count: each endpoint shared by c line-ends
            # collapses to one point, saving c-1.  sum-(n-1) would only
            # be right for acyclic chains — a closed loop of k ways
            # shares k endpoints and saves k.  A line whose own
            # start == end contributes one endpoint slot, not two.
            ends = Counter()
            for i in m:
                ends[(y0[i], x0[i])] += 1
                if (y1[i], x1[i]) != (y0[i], x0[i]):
                    ends[(y1[i], x1[i])] += 1
            saved = sum(c - 1 for c in ends.values() if c > 1)
            total = int(npts[m].sum() - saved)
            rows.append(list(key) + [int(members[0]), members.tolist(), int(len(m)), total])
        return pd.DataFrame(rows, columns=list(key_cols) + ["chain_id", "member_ids", "n_members", "total_points"])

    from ..functions.grouped import kernel_partitions

    # explicit repartition (reused by the groupBy — still one exchange)
    # keeps the kernel parallel; AQE would coalesce the small shuffle
    # to one partition and serialize the per-group python work
    return (
        prepared.repartition(kernel_partitions(prepared), *key_cols)
        .groupBy(*key_cols)
        .applyInPandas(kernel, out_schema)
    )


# RoadMerger.mergeTagsEqualValue:61-76 — roads merge only when all of
# these tags match exactly (null == null counts as equal)
ROAD_MERGE_TAGS = [
    "mkgmap:label:1",
    "mkgmap:label:2",
    "mkgmap:label:3",
    "mkgmap:label:4",
    "mkgmap:postal_code",
    "mkgmap:city",
    "mkgmap:region",
    "mkgmap:country",
    "mkgmap:is_in",
    "mkgmap:skipSizeFilter",
    "mkgmap:synthesised",
    "mkgmap:highest-resolution-only",
    "mkgmap:flare-check",
    "mkgmap:numbers",
]

MAX_MERGE_ANGLE = 130.0  # RoadMerger.java:48
_MU = 2.0 * 3.141592653589793 / (1 << 24)


def _turn_angle(c1, c2, c3) -> float:
    """Utils.getAngle: change of direction at c2 (0 = straight)."""
    from ..functions.bearing import rhumb_bearing_mu_deg

    a = rhumb_bearing_mu_deg(c2[0], c2[1], c1[0], c1[1])
    b = rhumb_bearing_mu_deg(c2[0], c2[1], c3[0], c3[1])
    ang = b - (a - 180)
    while ang > 180:
        ang -= 360
    while ang < -180:
        ang += 360
    return ang


ROAD_MERGE_SCHEMA = (
    "id long, member_ids array<bigint>, n_members int, "
    "lats array<int>, lons array<int>, road_class int, road_speed int, "
    "access long, route_flags long"
)


def merge_roads(
    roads: DataFrame,
    id_col: str = "id",
    tags_col: str = "tags",
) -> DataFrame:
    """RoadMerger semantics (osmstyle/RoadMerger.java:45-110,
    isMergeable:360): merge road2 onto road1 where end(road1) ==
    start(road2) and

    - road_class, road_speed, access bits, route flags equal,
    - the 14 mergeTagsEqualValue tags equal (null == null),
    - the merge would not create a closed way,
    - the turn angle at the merge point is <= 130 deg
      (Utils.getAngle over rhumb bearings),
    - the merge point is not a restricted via point for either way
      (optional ``restricted`` column: array of [y, x] pairs).

    Input: (id, lats, lons, road_class, road_speed, access,
    route_flags, tags[, restricted]).  Oneway direction is honoured by
    construction: only end-to-start chains merge, so two oneways of
    opposing digitization never concatenate (route_flags equality
    already forces the same oneway flag).

    Shuffle shape: groupBy the full attribute key (bounded-size groups
    per road class/name), greedy deterministic merge inside each group
    (points processed in sorted order, candidates by id — the
    reference's IdentityHashMap iteration is replaced by a stable
    order; row-for-row output vs the reference is therefore not
    guaranteed, but the mergeability RULES are).
    Output: ROAD_MERGE_SCHEMA, id = first member id per merged chain.
    """
    has_restricted = "restricted" in roads.columns
    key_cols = [
        F.coalesce(F.col(tags_col).getItem(t), F.lit("\x00")).alias(f"_k{i}")
        for i, t in enumerate(ROAD_MERGE_TAGS)
    ]
    sel = [
        F.col(id_col).alias("id"),
        "lats",
        "lons",
        F.col("road_class").cast("int"),
        F.col("road_speed").cast("int"),
        F.col("access").cast("long"),
        F.col("route_flags").cast("long"),
        *key_cols,
    ]
    if has_restricted:
        sel.append("restricted")
    prepared = roads.select(*sel)
    group_cols = ["road_class", "road_speed", "access", "route_flags"] + [
        f"_k{i}" for i in range(len(ROAD_MERGE_TAGS))
    ]

    def kernel(key, pdf):
        # bulk column extraction — itertuples on small per-group frames
        # costs ~3ms per call (pandas slow path on object columns) and
        # dominated the whole operator at 30k groups
        ids = pdf["id"].to_numpy()
        las = pdf["lats"].tolist()
        los = pdf["lons"].tolist()
        restrs = pdf["restricted"].tolist() if has_restricted else [None] * len(ids)
        rows = {}
        for i in range(len(ids)):
            restr = set()
            if restrs[i] is not None:
                restr = {(int(p[0]), int(p[1])) for p in restrs[i]}
            rows[int(ids[i])] = {
                "pts": list(zip([int(v) for v in las[i]], [int(v) for v in los[i]])),
                "members": [int(ids[i])],
                "restr": restr,
            }
        # endpoint indexes
        def rebuild():
            starts, ends = {}, {}
            for rid, rec in rows.items():
                starts.setdefault(rec["pts"][0], []).append(rid)
                ends.setdefault(rec["pts"][-1], []).append(rid)
            return starts, ends

        changed = True
        while changed:
            changed = False
            starts, ends = rebuild()
            for pt in sorted(set(starts) & set(ends)):
                merged_here = True
                while merged_here:
                    merged_here = False
                    starts, ends = rebuild()
                    cand1 = sorted(ends.get(pt, []))
                    cand2 = sorted(starts.get(pt, []))
                    for r1 in cand1:
                        for r2 in cand2:
                            if r1 == r2:
                                continue
                            rec1, rec2 = rows[r1], rows[r2]
                            if rec1["pts"][0] == rec2["pts"][-1]:
                                continue  # would close a loop
                            if pt in rec1["restr"] or pt in rec2["restr"]:
                                continue
                            ang = abs(_turn_angle(rec1["pts"][-2], pt, rec2["pts"][1]))
                            if ang > MAX_MERGE_ANGLE:
                                continue
                            rec1["pts"].extend(rec2["pts"][1:])
                            rec1["members"].extend(rec2["members"])
                            rec1["restr"] |= rec2["restr"]
                            del rows[r2]
                            changed = merged_here = True
                            break
                        if merged_here:
                            break

        out = []
        for rid in sorted(rows):
            rec = rows[rid]
            out.append(
                (
                    rec["members"][0],
                    sorted(rec["members"]),
                    len(rec["members"]),
                    [p[0] for p in rec["pts"]],
                    [p[1] for p in rec["pts"]],
                    int(key[0]),
                    int(key[1]),
                    int(key[2]),
                    int(key[3]),
                )
            )
        return out

    # partition-batched grouped map: one group per (class, speed,
    # access, flags, 14 tags) key — many small groups at scale, so
    # per-group Arrow crossing + frame construction would dominate
    from ..functions.grouped import grouped_map_in_pandas

    return grouped_map_in_pandas(
        prepared, group_cols, kernel, ROAD_MERGE_SCHEMA,
        columns=["id", "member_ids", "n_members", "lats", "lons",
                 "road_class", "road_speed", "access", "route_flags"],
    )


def merge_shapes(
    shapes: DataFrame,
    key_cols: list[str],
    id_col: str = "id",
) -> DataFrame:
    """Dissolve adjacent polygons of the same key into merged rings.

    ShapeMergeFilter semantics (filters/ShapeMergeFilter.java:56-93):
    shapes of one type sharing geometry merge.  Kernel: within a key
    group, directed boundary edges that cancel pairwise (a->b with
    b->a from the neighbouring shape) are interior seams and are
    removed; the surviving edges stitch into the dissolved outline(s).
    Signed area is conserved: sum(area2 of inputs) == sum(area2 of
    output rings) — the invariant the tests assert.

    Input ring orientation is normalized to CCW inside the kernel
    (Way.clockwise semantics); rings must be closed and
    non-self-touching — violations raise a clear ValueError instead of
    failing mid-walk.  Output: key cols + ring_idx + n_points + area2 +
    member_ids.
    """
    prepared = shapes.select(*key_cols, F.col(id_col).alias("id"), "lats", "lons")

    out_schema = (
        ", ".join(f"{c} string" for c in key_cols)
        + ", ring_idx int, n_points int, area2 long, member_ids array<bigint>"
    )

    def kernel(key, pdf):
        from collections import defaultdict

        edges = defaultdict(int)
        ids = sorted(int(i) for i in pdf["id"])
        for r in pdf.itertuples():
            la = list(r.lats)
            lo = list(r.lons)
            if la[0] == la[-1] and lo[0] == lo[-1]:
                la, lo = la[:-1], lo[:-1]
            # normalize orientation to CCW (Way.clockwise semantics) so
            # mixed-orientation inputs cannot silently cancel as seams
            a2 = sum(
                lo[i] * la[(i + 1) % len(la)] - lo[(i + 1) % len(la)] * la[i]
                for i in range(len(la))
            )
            if a2 < 0:
                la, lo = la[::-1], lo[::-1]
            n = len(la)
            for i in range(n):
                a = (la[i], lo[i])
                b = (la[(i + 1) % n], lo[(i + 1) % n])
                if edges[(b, a)] > 0:
                    edges[(b, a)] -= 1  # interior seam cancels
                else:
                    edges[(a, b)] += 1
        succ = defaultdict(list)
        indeg = defaultdict(int)
        for (a, b), cnt in edges.items():
            for _ in range(cnt):
                succ[a].append(b)
                indeg[b] += 1
        # precondition check: the surviving edge multigraph must be
        # Eulerian (in-degree == out-degree per vertex) or the ring walk
        # below would run off the succ list (unclosed / self-touching
        # input rings).  Fail loudly rather than IndexError mid-stage.
        for v in set(succ) | set(indeg):
            if len(succ.get(v, ())) != indeg.get(v, 0):
                raise ValueError(
                    f"merge_shapes: unbalanced edge graph at vertex {v} for key {key!r} "
                    f"(input rings must be closed, non-self-touching, consistent orientation)"
                )
        for a in succ:
            succ[a].sort()
        rings = []
        starts = sorted(succ.keys())
        used_from = defaultdict(int)
        for s0 in starts:
            while used_from[s0] < len(succ[s0]):
                ring = [s0]
                cur = succ[s0][used_from[s0]]
                used_from[s0] += 1
                while cur != s0:
                    ring.append(cur)
                    nxt = succ[cur][used_from[cur]]
                    used_from[cur] += 1
                    cur = nxt
                rings.append(ring)
        rows = []
        for idx, ring in enumerate(sorted(rings, key=lambda r: (min(r), len(r)))):
            ys = np.array([p[0] for p in ring], dtype=np.int64)
            xs = np.array([p[1] for p in ring], dtype=np.int64)
            a2 = int(np.sum(xs * np.roll(ys, -1) - np.roll(xs, -1) * ys))
            rows.append(list(key) + [idx, len(ring), a2, ids])
        return pd.DataFrame(
            rows, columns=list(key_cols) + ["ring_idx", "n_points", "area2", "member_ids"]
        )

    from ..functions.grouped import kernel_partitions

    return (
        prepared.repartition(kernel_partitions(prepared), *key_cols)
        .groupBy(*key_cols)
        .applyInPandas(kernel, out_schema)
    )
