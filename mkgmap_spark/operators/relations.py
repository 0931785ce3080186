"""Relation operators: member resolution, style `apply`, multipolygon
ring assembly + containment classification.

Reference semantics:
- member resolution: ElementSaver.java:140-165 — members looked up by
  (type, id); batch engine has the whole table, so it is a plain equi
  join (no deferred patching needed).
- `apply` action: osmstyle/actions (apply/apply_once) — tag updates
  pushed from a matching relation to its members; Spark: explode
  members -> join -> map_concat (LAST_WIN) back onto the member rows.
- multipolygon assembly: MultiPolygonRelation.java — member ways
  stitched end-to-end into closed rings (:jointed ways), then a
  ring-in-ring containment matrix decides outer vs inner: a ring
  contained in an even number of other rings is an outer, odd = hole
  (the reference computes direct-containment via PIP + segment
  rejection, MultiPolygonRelation.java:1356-1620; nesting parity is
  the observable classification).

Relations are small groups (a handful of member ways), so assembly is
a per-relation applyInPandas kernel over packed arrays — vectorized
winding tests inside, no per-point Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geometry import points_in_ring
from ..plans.materialize import materialize


def resolve_members(relations: DataFrame, features: DataFrame) -> DataFrame:
    """relation x member equi-join.

    relations: (id, members array<struct<role, mtype, ref>>); features:
    (id, kind, ...).  Output: one row per resolved member with role +
    the member's columns; unresolved refs are dropped (reference logs
    and skips them)."""
    m = relations.select(
        F.col("id").alias("rel_id"), F.posexplode("members").alias("m_idx", "m")
    ).select("rel_id", "m_idx", F.col("m.role").alias("role"), F.col("m.ref").alias("ref"))
    return m.join(features.withColumnRenamed("id", "ref"), "ref")


def apply_to_members(
    relations: DataFrame,
    features: DataFrame,
    rel_filter: F.Column,
    set_tags: dict[str, str],
) -> DataFrame:
    """Style `apply` semantics: for relations matching rel_filter, set
    the given tags on every member feature; non-members pass through.
    Collisions resolve last-wins per LAST_WIN policy; deterministic
    because the update map is constant."""
    targets = (
        relations.filter(rel_filter)
        .select(F.explode("members").alias("m"))
        .select(F.col("m.ref").alias("id"))
        .distinct()
    )
    upd = F.create_map(*[F.lit(x) for kv in set_tags.items() for x in kv])
    return (
        features.join(targets.withColumn("_hit", F.lit(True)), "id", "left")
        .withColumn(
            "tags",
            F.when(F.col("_hit"), F.map_concat(F.col("tags"), upd)).otherwise(F.col("tags")),
        )
        .drop("_hit")
    )


_PUSH_APPLY_SCHEMA = (
    "kind string, id long, tags map<string,string>, "
    "nested array<struct<rel_id: long, sub_idx: int, ctx: map<string,string>, seq: int>>"
)


def apply_pushed_to_members(
    relations: DataFrame,
    features: DataFrame,
    rules,
    pushes: DataFrame | None = None,
    relations_out: DataFrame | None = None,
    max_rounds: int = 8,
) -> DataFrame:
    """Execute the rule engine's ``apply``/``apply_once`` pushes against
    member elements (SubAction.java semantics).

    ``relations``: (id, members array<struct<role, mtype, ref>>).
    ``features``: (kind, id, tags) — the elements to update (members
    resolve on (mtype, ref) == (kind, id)).
    ``relations_out``: output of ``compile_rules(..., is_relation=True,
    with_pushed=True)`` over the relations (carries the ``pushed``
    column of (sub_idx, relation-tag-snapshot) structs).

    The per-member executor is the interpreter's own Python action
    code (rules/interpreter.apply_sub_to_member) run as a grouped
    Arrow kernel — exact parity with the differential oracle; Python
    touches only relation members (a small fraction of any corpus),
    never the main element scan.  Nested ``apply`` blocks (a member
    that is itself a relation) iterate: each round's kernel returns
    the nested pushes, re-keyed deterministically, until none remain
    (mkgmap resolves the same nesting recursively in SubAction).

    Ordering: pushes execute per member sorted by (relation id, push
    order within the relation, member position) — mkgmap's order is
    input-file order, which our decoded tables expose as id order.
    Returns ``features`` with updated ``tags``.
    """
    from pyspark.sql import Window

    from ..rules.compiler import compiled_sub_actions
    from ..rules.interpreter import apply_sub_to_member

    subs = compiled_sub_actions(rules)

    if pushes is None:
        if relations_out is None:
            raise ValueError("need relations_out (with pushed column) or pushes")
        pushes = relations_out.filter(F.size("pushed") > 0).select(
            F.col("id").alias("rel_id"),
            F.posexplode("pushed").alias("push_idx", "p"),
        ).select(
            "rel_id",
            "push_idx",
            F.col("p.sub_idx").alias("sub_idx"),
            F.col("p.ctx").alias("ctx"),
        )

    def run_batches(it):
        # batch-level executor: one column extraction per Arrow batch,
        # numpy group boundaries, straight python over index ranges —
        # per-member pandas slicing would cost ~0.5ms x |members|.
        # Rows arrive repartitioned by (kind, id) and sorted by
        # (kind, id, rel_id, push_idx, m_idx), so groups are contiguous
        # and already in execution order.
        # NOTE: deliberately NOT functions/grouped.grouped_map_in_pandas
        # — that helper still hands each group a pandas slice (~40us x
        # |members| here, measured); this executor avoids per-group
        # pandas entirely. Keep the carry-over logic in sync with the
        # helper's.
        import numpy as _np
        import pandas as _pd

        sub_idx_of = {id(a): i for i, a in enumerate(subs)}
        carry: _pd.DataFrame | None = None

        def process(pdf, is_last):
            nonlocal carry
            if carry is not None and len(carry):
                pdf = _pd.concat([carry, pdf], ignore_index=True)
            carry = None
            n = len(pdf)
            if n == 0:
                return None
            kinds = pdf["kind"].to_numpy()
            ids = pdf["id"].to_numpy()
            change = _np.zeros(n, dtype=bool)
            change[0] = True
            change[1:] = (ids[1:] != ids[:-1]) | (kinds[1:] != kinds[:-1])
            starts = _np.flatnonzero(change)
            ends = _np.append(starts[1:], n)
            if not is_last:
                carry = pdf.iloc[int(starts[-1]) :].reset_index(drop=True)
                starts, ends = starts[:-1], ends[:-1]
            if len(starts) == 0:
                return None
            rel_ids = pdf["rel_id"].to_numpy()
            push_idxs = pdf["push_idx"].to_numpy()
            sub_idxs = pdf["sub_idx"].to_numpy()
            roles = pdf["role"].to_numpy()
            ctxs = pdf["ctx"].to_numpy()
            tagss = pdf["tags"].to_numpy()
            rows = []
            for g in range(len(starts)):
                s, e = int(starts[g]), int(ends[g])
                kind, mid = kinds[s], int(ids[s])
                is_rel = kind == "relation"
                tags = dict(tagss[s]) if tagss[s] is not None else {}
                nested_rows = []
                seen_once: set[tuple] = set()
                seq = 0
                for i in range(s, e):
                    sub = subs[int(sub_idxs[i])]
                    if sub.role is not None and sub.role != roles[i]:
                        continue
                    if sub.once:
                        k = (int(rel_ids[i]), int(push_idxs[i]))
                        if k in seen_once:
                            continue
                        seen_once.add(k)
                    ctx = dict(ctxs[i]) if ctxs[i] is not None else {}
                    tags, nested = apply_sub_to_member(sub, ctx, tags, member_is_relation=is_rel)
                    for a, nctx in nested:
                        nested_rows.append((mid, sub_idx_of[id(a)], nctx, seq))
                        seq += 1
                rows.append((kind, mid, tags, nested_rows))
            return _pd.DataFrame(rows, columns=["kind", "id", "tags", "nested"])

        prev = None
        for pdf in it:
            if prev is not None:
                out = process(prev, is_last=False)
                if out is not None:
                    yield out
            prev = pdf
        if prev is not None:
            out = process(prev, is_last=True)
            if out is not None:
                yield out

    # nested applies exist only when some apply's sub list contains
    # another apply — statically known, so single-level rulesets skip
    # the extra drain round (one full job) entirely
    has_nested = any(any(x.kind == "apply" for x in s.sub) for s in subs)
    for round_i in range(max_rounds):
        if round_i > 0 and not has_nested:
            break
        if round_i > 0 and pushes.limit(1).count() == 0:
            break
        from ..functions.grouped import kernel_partitions

        exploded = (
            pushes.join(relations.select(F.col("id").alias("rel_id"), "members"), "rel_id")
            .select("rel_id", "push_idx", "sub_idx", "ctx", F.posexplode("members").alias("m_idx", "m"))
            .select(
                "rel_id", "push_idx", "sub_idx", "ctx", "m_idx",
                F.col("m.role").alias("role"),
                F.col("m.mtype").alias("kind"),
                F.col("m.ref").alias("id"),
            )
        )
        # repartition BEFORE the features join: the join requires
        # (kind, id) clustering on both sides anyway, so the explicit
        # exchange doubles as the join's left-side distribution AND the
        # kernel's partitioning (pinned at the configured parallelism —
        # AQE would coalesce it under a CPU-bound python stage), saving
        # the separate post-join repartition exchange.
        x = exploded.repartition(kernel_partitions(exploded), "kind", "id").join(
            features.select("kind", "id", "tags"), ["kind", "id"]
        )
        d = x.sortWithinPartitions(
            "kind", "id", "rel_id", "push_idx", "m_idx"
        )
        # eager localCheckpoint: materializes the round's member
        # updates once and truncates lineage, so no persisted cache
        # accumulates across rounds (blocks are freed by the context
        # cleaner when the handle goes out of scope)
        result = d.mapInPandas(run_batches, _PUSH_APPLY_SCHEMA).transform(materialize)
        upd = result.select("kind", "id", F.col("tags").alias("_new_tags"))
        features = (
            features.join(upd, ["kind", "id"], "left")
            .withColumn("tags", F.coalesce(F.col("_new_tags"), F.col("tags")))
            .drop("_new_tags")
        )
        # nested pushes: deterministic re-keying by (member id, seq)
        w = Window.partitionBy("rel_id").orderBy("seq")
        pushes = (
            result.select(F.explode("nested").alias("n"))
            .select(
                F.col("n.rel_id").alias("rel_id"),
                F.col("n.sub_idx").alias("sub_idx"),
                F.col("n.ctx").alias("ctx"),
                F.col("n.seq").alias("seq"),
            )
            .withColumn("push_idx", F.row_number().over(w) - 1)
            .drop("seq")
        )
    return features


MP_OUT_SCHEMA = (
    "rel_id long, ring_idx int, closed boolean, is_hole boolean, "
    "n_points int, lats array<int>, lons array<int>"
)


def assemble_multipolygons(relations: DataFrame, ways: DataFrame) -> DataFrame:
    """Assemble member ways into rings and classify outer/hole.

    relations: (id, members); ways: (id, lats, lons).  Output one row
    per assembled ring (MP_OUT_SCHEMA); rings that cannot be closed are
    emitted with closed=false, is_hole=false (the reference warns and
    tries to fix such polygons)."""
    members = (
        relations.select(F.col("id").alias("rel_id"), F.explode("members").alias("m"))
        .filter(F.col("m.mtype") == "way")
        .select("rel_id", F.col("m.ref").alias("ref"))
    )
    joined = members.join(
        ways.select(F.col("id").alias("ref"), "lats", "lons"), "ref"
    )

    def kernel(key, pdf):
        rel_id = int(key[0])
        segs = [
            (np.asarray(r.lats, dtype=np.int64), np.asarray(r.lons, dtype=np.int64))
            for r in pdf.itertuples()
            if len(r.lats) >= 2
        ]
        rings = _stitch_rings(segs)
        rows = []
        closed_rings = [r for r in rings if r[2]]
        # containment depth: ring i's first vertex tested against every
        # other closed ring (vectorized winding per ring)
        depths = []
        for i, (la, lo, closed) in enumerate(rings):
            d = 0
            if closed:
                for j, (lb, lb2, closed2) in enumerate(rings):
                    if i == j or not closed2:
                        continue
                    if points_in_ring(la[:1], lo[:1], lb, lb2)[0]:
                        d += 1
            depths.append(d)
        for idx, ((la, lo, closed), d) in enumerate(zip(rings, depths)):
            rows.append(
                (
                    rel_id,
                    idx,
                    bool(closed),
                    bool(closed and d % 2 == 1),
                    int(len(la)),
                    la.astype(np.int32).tolist(),
                    lo.astype(np.int32).tolist(),
                )
            )
        return pd.DataFrame(
            rows,
            columns=["rel_id", "ring_idx", "closed", "is_hole", "n_points", "lats", "lons"],
        )

    from ..functions.grouped import kernel_partitions

    return (
        joined.repartition(kernel_partitions(joined), "rel_id")
        .groupBy("rel_id")
        .applyInPandas(kernel, MP_OUT_SCHEMA)
    )


def _stitch_rings(segs):
    """Join way segments end-to-end (MultiPolygonRelation joinWays).

    Deterministic: always extend with the lowest-index unused segment
    that fits; reverse when needed.  Returns list of (lats, lons,
    closed); ring point lists do not repeat the first point, and each
    ring is canonicalized to start at its lexicographically smallest
    vertex with orientation chosen so the second vertex is smallest
    (the shared canonicalization for row-for-row comparisons)."""
    used = [False] * len(segs)
    rings = []
    for start in range(len(segs)):
        if used[start]:
            continue
        used[start] = True
        la = list(segs[start][0])
        lo = list(segs[start][1])
        while True:
            if la[0] == la[-1] and lo[0] == lo[-1]:
                break
            ext = None
            for j in range(len(segs)):
                if used[j]:
                    continue
                sl, so = segs[j]
                if sl[0] == la[-1] and so[0] == lo[-1]:
                    ext = (j, False)
                    break
                if sl[-1] == la[-1] and so[-1] == lo[-1]:
                    ext = (j, True)
                    break
            if ext is None:
                break
            j, rev = ext
            used[j] = True
            sl, so = segs[j]
            if rev:
                sl, so = sl[::-1], so[::-1]
            la.extend(sl[1:])
            lo.extend(so[1:])
        closed = len(la) >= 4 and la[0] == la[-1] and lo[0] == lo[-1]
        if closed:
            la, lo = la[:-1], lo[:-1]
            la, lo = _canon_ring(la, lo)
        rings.append((np.asarray(la, dtype=np.int64), np.asarray(lo, dtype=np.int64), closed))
    return rings


def _canon_ring(la, lo):
    pts = list(zip(la, lo))
    k = min(range(len(pts)), key=lambda i: pts[i])
    pts = pts[k:] + pts[:k]
    if len(pts) >= 3 and pts[-1] < pts[1]:
        pts = [pts[0]] + pts[1:][::-1]
    return [p[0] for p in pts], [p[1] for p in pts]


CUT_OUT_SCHEMA = "rel_id long, poly_idx int, n_points int, lats array<int>, lons array<int>"


def cut_multipolygons(rings: DataFrame) -> DataFrame:
    """Hole elimination per relation (MultiPolygonCutter.java:70-200
    contract: Garmin shapes cannot carry holes).

    Input: assemble_multipolygons output (MP_OUT_SCHEMA).  Each closed
    outer ring becomes one hole-free simple polygon with its contained
    holes bridged in (functions/holes.py — coverage-identical to the
    reference's awt-Area subtraction, decomposition differs and is
    documented there).  Unclosed rings are dropped like the
    reference's warn-and-skip.  Relations are small groups: one
    grouped Arrow kernel, no shuffle beyond the groupBy."""
    import numpy as np

    from ..functions.geometry import points_in_ring
    from ..functions.holes import cut_out_inner_polygons

    def kernel(key, pdf):
        rel_id = int(key[0])
        closed = pdf[pdf["closed"]]
        outers = closed[~closed["is_hole"]]
        holes = closed[closed["is_hole"]]
        hole_rings = [
            (np.asarray(r["lats"], dtype=np.int64), np.asarray(r["lons"], dtype=np.int64))
            for _, r in holes.iterrows()
        ]
        out = []
        used = np.zeros(len(hole_rings), dtype=bool)
        for _, orow in outers.sort_values("ring_idx").iterrows():
            oy = np.asarray(orow["lats"], dtype=np.int64)
            ox = np.asarray(orow["lons"], dtype=np.int64)
            mine = []
            for hi, (hy, hx) in enumerate(hole_rings):
                if used[hi]:
                    continue
                if points_in_ring(hy[:1], hx[:1], oy, ox)[0]:
                    mine.append((hy, hx))
                    used[hi] = True
            my, mx = cut_out_inner_polygons((oy, ox), mine)
            out.append((rel_id, len(out), len(my), my.tolist(), mx.tolist()))
        import pandas as pd

        return pd.DataFrame(
            out, columns=["rel_id", "poly_idx", "n_points", "lats", "lons"]
        )

    from ..functions.grouped import kernel_partitions

    return (
        rings.repartition(kernel_partitions(rings), "rel_id")
        .groupBy("rel_id")
        .applyInPandas(kernel, CUT_OUT_SCHEMA)
    )
