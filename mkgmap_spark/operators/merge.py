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

    return prepared.groupBy(*key_cols).applyInPandas(kernel, out_schema)


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

    return prepared.groupBy(*key_cols).applyInPandas(kernel, out_schema)
