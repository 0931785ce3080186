"""Turn-restriction relations -> routing restriction table.

Reference: reader/osm/RestrictionRelation.java — a type=restriction
relation with from/via/to members becomes a routing restriction at the
via node when

- the restriction kind is supported (:64-67 supportedRestrictions:
  no_/only_ right|left|straight / no_u_turn / no_entry / no_exit),
- exactly one 'from' way and one 'to' way resolve, and the via is
  either one NODE or an ordered CHAIN of via ways (:235-248 collects
  every via-way member; :352-413 walks the chain junction-to-junction),
- via NODE form: the node is an END point of both the from and the to
  way; via WAY form: from attaches at an endpoint of the first via
  way, each via way attaches at the running junction, to attaches at
  the last junction (RestrictionRelation.eval connectivity checks),

and carries an exception bitmask over the vehicle classes
(AccessTagsAndBits bit order): DEFAULT_EXCEPT_MASK = FOOT|EMERGENCY
(:62), `except=v1;v2` tags OR bits in (:182-188), a
`type=restriction:<vehicle>` prefix restricts TO that vehicle by
clearing its bit from 0xff (:172-180 / setExceptMask:451-489).

Everything is Column arithmetic + equi joins — no Python in the path.
The restrictions table feeds RoadMerger (restricted via points) and
the tile sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# AccessTagsAndBits vehicle flags (FOOT=1, BIKE=2, CAR=4, DELIVERY=8,
# TRUCK=16, BUS=32, TAXI=64, EMERGENCY=128)
_FOOT, _BIKE, _CAR, _DELIVERY, _TRUCK, _BUS, _TAXI, _EMERGENCY = (
    1, 2, 4, 8, 16, 32, 64, 128,
)
DEFAULT_EXCEPT_MASK = _FOOT | _EMERGENCY  # 0x81

# setExceptMask vehicle -> flag ('vehicle'/'motor_vehicle' invert)
VEHICLE_FLAGS = {
    "vehicle": (~DEFAULT_EXCEPT_MASK) & 0xFF,
    "motor_vehicle": (~(_BIKE | DEFAULT_EXCEPT_MASK)) & 0xFF,
    "psv": _TAXI | _BUS,
    "bicycle": _BIKE,
    "motorcar": _CAR,
    "bus": _BUS,
    "taxi": _TAXI,
    "goods": _DELIVERY,
    "hgv": _TRUCK,
    "truck": _TRUCK,
    "emergency": _EMERGENCY,
    "foot": _FOOT,
}

SUPPORTED_RESTRICTIONS = [
    "no_right_turn", "no_left_turn", "no_u_turn", "no_straight_on",
    "only_right_turn", "only_left_turn", "only_straight_on",
    "no_entry", "no_exit",
]


def _flag_map() -> F.Column:
    return F.create_map(
        *[x for k, v in VEHICLE_FLAGS.items() for x in (F.lit(k), F.lit(v))]
    )


def turn_restrictions(
    relations: DataFrame, ways: DataFrame, nodes: DataFrame
) -> DataFrame:
    """relations: (id, tags, members array<struct<role, mtype, ref>>);
    ways: (id, lats, lons); nodes: (id, lat, lon).

    Output (valid restrictions only): (rel_id, restriction, except_mask,
    via_node, from_way, to_way, via_lat, via_lon)."""
    from ..plans.materialize import materialize as _materialize
    from ..plans.materialize import materialize_lazy as _materialize_lazy

    tags = F.col("tags")
    rtype = tags.getItem("type")
    is_restriction = rtype.eqNullSafe("restriction") | rtype.startswith("restriction:")
    # restriction:<vehicle>=kind TAGS (RestrictionRelation:115-137):
    # when present, the mask starts at 0xff and each named vehicle's
    # bits clear; the kind comes from the plain tag or the first
    # (key-sorted) vehicle entry; DIFFERING kinds invalidate.
    # The sorted-entries and distinct-kinds subtrees are referenced by
    # several downstream expressions (mask fold, kind fallback,
    # consistency filter); lambda expressions get no common-
    # subexpression elimination, so compute both ONCE behind a barrier
    # and let everything downstream read plain columns.  The
    # restrictions side is relations-small at any scale, so the
    # checkpoint is bounded.  The cut is LAZY: the eager checkpoint of
    # the validated rows below is the next action and fully scans this
    # frame, so its job persists these blocks too — one job, two cuts.
    r = _materialize_lazy(
        relations.filter(is_restriction).select(
            F.col("id").alias("rel_id"),
            "tags",
            "members",
            F.expr(
                "array_sort(map_entries(map_filter(tags, (k, v) -> k like 'restriction:%')))"
            ).alias("_rv"),
            F.expr(
                "array_distinct(transform(map_entries(map_filter(tags, (k, v) -> k like 'restriction:%')), e -> e.value))"
            ).alias("_rvk"),
        )
    )

    fm0 = _flag_map()
    rv = F.col("_rv")
    rv_kinds = F.col("_rvk")
    rv_mask = F.aggregate(
        rv,
        F.lit(0xFF),
        lambda acc, e: acc
        - acc.bitwiseAND(F.coalesce(fm0[F.substring(e.getField("key"), 13, 64)], F.lit(0))),
    )
    restriction = F.coalesce(tags.getItem("restriction"), F.expr("get(_rv, 0).value"))
    # type=restriction:<vehicle> applies only to that vehicle: mask
    # starts at 0xff with the vehicle's bits cleared
    type_vehicle = F.when(
        rtype.startswith("restriction:"), F.expr("substring(tags['type'], 13)")
    )
    # precedence per the reference's execution order: the vehicles
    # block runs first but the type=restriction:<v> block RESETS the
    # mask afterwards (:172-180), so the type form wins when both occur
    base_mask = (
        F.when(type_vehicle.isNotNull(), F.lit(0xFF) - F.coalesce(_flag_map()[type_vehicle], F.lit(0)))
        .when(F.size(rv) > 0, rv_mask)
        .otherwise(F.lit(DEFAULT_EXCEPT_MASK))
    )
    # conflicting restriction:<v> kinds -> relation invalid
    kinds_consistent = (F.size(rv_kinds) <= 1) & (
        tags.getItem("restriction").isNull()
        | (F.size(rv_kinds) == 0)
        | tags.getItem("restriction").eqNullSafe(F.expr("get(_rvk, 0)"))
    )
    r = r.filter(kinds_consistent)
    # except=v1;v2 ORs bits in (split on , or ;)
    fm = _flag_map()
    except_mask = F.when(
        tags.getItem("except").isNotNull(),
        F.aggregate(
            F.split(tags.getItem("except"), "[,;]"),
            base_mask.cast("int"),
            lambda acc, v: acc.bitwiseOR(F.coalesce(fm[F.trim(v)], F.lit(0))),
        ),
    ).otherwise(base_mask.cast("int"))

    m = lambda role, mtype: F.filter(
        F.col("members"), lambda x: (x.getField("role") == role) & (x.getField("mtype") == mtype)
    )
    r = r.select(
        "rel_id",
        restriction.alias("restriction"),
        except_mask.alias("except_mask"),
        m("from", "way").alias("_from"),
        m("to", "way").alias("_to"),
        m("via", "node").alias("_via"),
        m("via", "way").alias("_viaw"),
    )
    # membership rules (RestrictionRelation.java:250-265, 321-325):
    # multiple 'from' ways only for no_entry, multiple 'to' ways only
    # for no_exit, and never together with via WAYS; via is one NODE
    # or an ordered CHAIN of one or more via ways (:235-248 appends
    # every via-way member; a via way AFTER a via node invalidates)
    single_ft = (F.size("_from") == 1) & (F.size("_to") == 1)
    multi_from = (
        (F.col("restriction") == "no_entry")
        & (F.size("_from") >= 1) & (F.size("_to") == 1)
    )
    multi_to = (
        (F.col("restriction") == "no_exit")
        & (F.size("_from") == 1) & (F.size("_to") >= 1)
    )
    via_node_form = (F.size("_via") == 1) & (F.size("_viaw") == 0)
    via_way_form = (F.size("_via") == 0) & (F.size("_viaw") >= 1)
    r = r.filter(
        F.col("restriction").isin(*SUPPORTED_RESTRICTIONS)
        & (
            (single_ft & (via_node_form | via_way_form))
            | ((multi_from | multi_to) & via_node_form)
        )
    ).select(
        "rel_id",
        "restriction",
        "except_mask",
        F.expr("transform(_from, m -> m.ref)").alias("from_ways"),
        F.expr("transform(_to, m -> m.ref)").alias("to_ways"),
        # get() tolerates the empty array (ANSI [i] throws)
        F.expr("get(_via, 0).ref").alias("via_node"),
        F.expr("get(_viaw, 0).ref").alias("via_way"),
        F.expr("transform(_viaw, m -> m.ref)").alias("via_ways"),
    )
    # materialize the validated relations ONCE: everything above is a
    # ladder of higher-order map/array expressions (mask folds, member
    # splits, the kind-consistency filter) that Catalyst inlines into
    # every consumer — and r feeds FIVE scans (rn_b, chk, and the three
    # via-way-branch derivations), so without a barrier the whole HOF
    # ladder re-evaluates per scan (no subexpression elimination inside
    # lambda functions).  The restrictions side is relations-small at
    # any scale, so the checkpoint is bounded.
    r = _materialize(r)

    wends = ways.select(
        F.col("id").alias("_wid"),
        F.expr("lats[0]").alias("_sy"), F.expr("lons[0]").alias("_sx"),
        F.expr("lats[size(lats) - 1]").alias("_ey"), F.expr("lons[size(lons) - 1]").alias("_ex"),
    )

    # --- via-NODE form: the via node must be an END point of every
    # from way and every to way, and validation is all-or-nothing per
    # relation (the reference's eval loop flips `valid` for the WHOLE
    # relation when any member fails, :367-374/:405-413); valid
    # relations then emit one restriction row per from x to pair (how
    # RoadNetwork.addRestriction expands the lists)
    via = nodes.select(
        F.col("id").alias("via_node"), F.col("lat").alias("via_lat"), F.col("lon").alias("via_lon")
    )
    touches = (
        ((F.col("_sy") == F.col("via_lat")) & (F.col("_sx") == F.col("via_lon")))
        | ((F.col("_ey") == F.col("via_lat")) & (F.col("_ex") == F.col("via_lon")))
    )
    rn_b = r.filter(F.col("via_node").isNotNull()).join(via, "via_node")
    chk = (
        rn_b.select(
            "rel_id", "via_lat", "via_lon",
            F.explode(F.concat("from_ways", "to_ways")).alias("_wid"),
        )
        .join(wends, "_wid")
        .groupBy("rel_id")
        .agg(
            F.count(F.lit(1)).alias("_n_resolved"),
            F.sum(F.when(touches, 1).otherwise(0)).alias("_n_touching"),
        )
    )
    rn = (
        rn_b.join(chk, "rel_id")
        .filter(
            (F.col("_n_resolved") == F.size("from_ways") + F.size("to_ways"))
            & (F.col("_n_touching") == F.col("_n_resolved"))
        )
        .select(
            "rel_id", "restriction", "except_mask", "via_node", "via_way",
            "via_ways", "via_lat", "via_lon",
            F.explode("from_ways").alias("from_way"),
            "to_ways",
        )
        .select(
            "rel_id", "restriction", "except_mask", "via_node", "via_way",
            "via_ways", "via_lat", "via_lon", "from_way",
            F.explode("to_ways").alias("to_way"),
        )
    )

    # --- via-WAY chain form (RestrictionRelation.java:352-413): the
    # 'from' way must end at an endpoint of the FIRST via way; each
    # subsequent via way must start or end at the running junction
    # (its other endpoint becomes the next junction); the 'to' way
    # must end at the LAST junction.  Distributed re-expression:
    # posexplode the ordered via refs -> equi join way endpoints ->
    # regroup into an ordered chain array -> one JVM aggregate() fold
    # per relation walks the chain (chains are short — real OSM data
    # has 1-3 via ways — so the per-row array is bounded).
    # via-way form is single-from/single-to by the membership filter
    rwb = (
        r.filter(F.size("via_ways") >= 1)
        .withColumn("from_way", F.expr("get(from_ways, 0)"))
        .withColumn("to_way", F.expr("get(to_ways, 0)"))
    )
    ve = rwb.select("rel_id", F.posexplode("via_ways").alias("_pos", "_wid"))
    vchain = (
        ve.join(wends, "_wid")
        .groupBy("rel_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("_pos", "_sy", "_sx", "_ey", "_ex"))
            ).alias("_chain")
        )
    )

    fr = wends.select(
        F.col("_wid").alias("from_way"),
        F.col("_sy").alias("_fy1"), F.col("_sx").alias("_fx1"),
        F.col("_ey").alias("_fy2"), F.col("_ex").alias("_fx2"),
    )
    to = wends.select(
        F.col("_wid").alias("to_way"),
        F.col("_sy").alias("_ty1"), F.col("_sx").alias("_tx1"),
        F.col("_ey").alias("_ty2"), F.col("_ex").alias("_tx2"),
    )
    rw = rwb.join(vchain, "rel_id").join(fr, "from_way").join(to, "to_way")

    c0 = F.expr("get(_chain, 0)")

    def _f_at(py, px):
        return ((F.col("_fy1") == py) & (F.col("_fx1") == px)) | (
            (F.col("_fy2") == py) & (F.col("_fx2") == px)
        )

    f_at_v1 = _f_at(c0.getField("_sy"), c0.getField("_sx"))
    f_at_v2 = _f_at(c0.getField("_ey"), c0.getField("_ex"))
    # reference checks v1 first (eval loop :367-374): when the from way
    # touches both ends of the first via way, v1 wins
    rw = (
        rw.withColumn("_ok0", f_at_v1 | f_at_v2)
        .withColumn("_vy0", F.when(f_at_v1, c0.getField("_sy")).otherwise(c0.getField("_ey")))
        .withColumn("_vx0", F.when(f_at_v1, c0.getField("_sx")).otherwise(c0.getField("_ex")))
    )
    # chain walk: fold over the ordered via ways; acc = (ok, junction).
    # The first via way is itself re-walked from the from-junction,
    # yielding its far endpoint — exactly the reference's viaPoints loop.
    walk = F.aggregate(
        F.col("_chain"),
        F.struct(
            F.col("_ok0").alias("ok"), F.col("_vy0").alias("vy"), F.col("_vx0").alias("vx")
        ),
        lambda acc, w: F.struct(
            (
                acc.getField("ok")
                & (
                    ((w.getField("_sy") == acc.getField("vy")) & (w.getField("_sx") == acc.getField("vx")))
                    | ((w.getField("_ey") == acc.getField("vy")) & (w.getField("_ex") == acc.getField("vx")))
                )
            ).alias("ok"),
            F.when(
                (w.getField("_sy") == acc.getField("vy")) & (w.getField("_sx") == acc.getField("vx")),
                w.getField("_ey"),
            ).otherwise(w.getField("_sy")).alias("vy"),
            F.when(
                (w.getField("_sy") == acc.getField("vy")) & (w.getField("_sx") == acc.getField("vx")),
                w.getField("_ex"),
            ).otherwise(w.getField("_sx")).alias("vx"),
        ),
    )
    rw = rw.withColumn("_walk", walk)
    last_vy = F.col("_walk").getField("vy")
    last_vx = F.col("_walk").getField("vx")
    to_attaches = ((F.col("_ty1") == last_vy) & (F.col("_tx1") == last_vx)) | (
        (F.col("_ty2") == last_vy) & (F.col("_tx2") == last_vx)
    )
    # validity (:331-344, :418-428): every via ref resolved to a way,
    # no via way closed (start==end -> ambiguous walk), via ways must
    # not double as the from or to way, walk connected end-to-end
    not_closed = F.forall(
        "_chain",
        lambda w: ~(
            (w.getField("_sy") == w.getField("_ey")) & (w.getField("_sx") == w.getField("_ex"))
        ),
    )
    rw = (
        rw.filter(
            (F.size("_chain") == F.size("via_ways"))
            & not_closed
            & ~F.array_contains(F.col("via_ways"), F.col("from_way"))
            & ~F.array_contains(F.col("via_ways"), F.col("to_way"))
            & F.col("_walk").getField("ok")
            & to_attaches
        )
        # report the junction where the restriction STARTS (from x via),
        # the reference's viaPoints[0]
        .withColumn("via_lat", F.col("_vy0"))
        .withColumn("via_lon", F.col("_vx0"))
    )

    cols = [
        "rel_id", "restriction", "except_mask", "via_node", "via_way",
        "via_ways", "from_way", "to_way", "via_lat", "via_lon",
    ]
    rn = rn.withColumn("via_ways", F.lit(None).cast("array<long>"))
    return rn.select(*cols).unionByName(rw.select(*cols))
