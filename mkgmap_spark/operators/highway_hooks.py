"""Highway reading hooks (HighwayHooks.java) as Column transforms.

The reference mutates elements while streaming them in:
 - roundabouts get an implicit ``oneway=yes`` (HighwayHooks.java:139-144),
 - with --make-opposite-cycleways, oneway streets that let bicycles
   ride against the flow are flagged ``mkgmap:make-cycle-way=yes``
   (HighwayHooks.java:145-168) and StyledConverter later duplicates
   them as synthesised cycleways (StyledConverter.makeCycleWay:549-572),
 - motorway exits (highway=motorway_junction/services) get
   ``mkgmap:osmid`` and, when untagged, inherit ``exit:road_ref`` from
   the motorway/trunk way passing through them
   (HighwayHooks.finishExits:185-210).

Here each rule is a pure tags-map Column expression over the element
table; the exit-ref autofill is one equi join from exit nodes to the
exploded motorway node list.  All shapes are scan + narrow transforms
(the join keys are node ids, exits being the naturally small side),
so the hooks cost nothing extra at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# explicit vehicle-class tags removed from a synthesised cycleway
# (StyledConverter.makeCycleWay:558-570)
_CYCLE_DROP = (
    "foot", "motorcar", "goods", "hgv", "bus", "taxi", "emergency",
    "vehicle", "motor_vehicle", "carpool", "motorcycle", "psv", "truck",
)


def _tag(name: str):
    return F.col("tags").getItem(name)


def _like_yes(col) -> F.Column:
    return col.isin("yes", "true", "1")


def _with_tags(updates: dict) -> F.Column:
    """tags ++ updates (existing keys replaced)."""
    keys = list(updates)
    return F.map_concat(
        F.map_filter(F.col("tags"), lambda k, v: ~k.isin(*keys)),
        F.map_filter(
            F.map_from_arrays(
                F.array(*[F.lit(k) for k in keys]),
                F.array(*[updates[k] for k in keys]),
            ),
            lambda k, v: v.isNotNull(),
        ),
    )


def highway_hooks_ways(ways: DataFrame,
                       make_opposite_cycleways: bool = False) -> DataFrame:
    """Apply the onAddWay rules: implicit roundabout oneway and the
    opposite-cycleway flag."""
    is_road = _tag("highway").isNotNull() | (_tag("route") == "ferry")
    roundabout_oneway = (
        is_road & (_tag("junction") == "roundabout") & _tag("oneway").isNull()
    )
    out = ways.withColumn(
        "tags",
        F.when(roundabout_oneway,
               _with_tags({"oneway": F.lit("yes")}))
         .otherwise(F.col("tags")),
    )
    if not make_opposite_cycleways:
        return out

    onew = _tag("oneway")
    oneway = _like_yes(onew) | onew.isin("-1", "reverse")
    cw = _tag("cycleway")
    opposite = cw.isin("opposite", "opposite_lane", "opposite_track")
    side_lane = (_tag("cycleway:left") == "opposite_lane") | \
        (_tag("cycleway:right") == "opposite_lane")
    side_track = (_tag("cycleway:left") == "opposite_track") | \
        (_tag("cycleway:right") == "opposite_track")
    bike_against = (_tag("oneway:bicycle") == "no") | \
        (_tag("bicycle:oneway") == "no")
    # Java's !"cycleway".equals(highway) is true for a null highway
    # (ferry route), so null must pass here
    not_cycleway = _tag("highway").isNull() | (_tag("highway") != "cycleway")
    add_cycleway = (
        is_road & not_cycleway & oneway
        & (bike_against | opposite | side_lane | side_track)
    )
    return out.withColumn(
        "tags",
        F.when(add_cycleway,
               _with_tags({"mkgmap:make-cycle-way": F.lit("yes")}))
         .otherwise(F.col("tags")),
    )


def synthesize_cycleways(ways: DataFrame) -> DataFrame:
    """StyledConverter.makeCycleWay: every way flagged
    ``mkgmap:make-cycle-way`` is duplicated as a two-direction
    bicycle-only way (access=no, bicycle=yes, oneway=no,
    mkgmap:synthesised=yes, explicit vehicle-class tags dropped); the
    flag is removed from the original."""
    flagged = _tag("mkgmap:make-cycle-way") == "yes"
    originals = ways.withColumn(
        "tags",
        F.when(flagged,
               F.map_filter(F.col("tags"),
                            lambda k, v: k != F.lit("mkgmap:make-cycle-way")))
         .otherwise(F.col("tags")),
    )
    dup = ways.filter(flagged)
    drop = ("mkgmap:make-cycle-way",) + _CYCLE_DROP + (
        "access", "bicycle", "oneway", "mkgmap:synthesised")
    cycle_tags = F.map_concat(
        F.map_filter(F.col("tags"), lambda k, v: ~k.isin(*drop)),
        F.map_from_arrays(
            F.array(F.lit("access"), F.lit("bicycle"), F.lit("oneway"),
                    F.lit("mkgmap:synthesised")),
            F.array(F.lit("no"), F.lit("yes"), F.lit("no"), F.lit("yes")),
        ),
    )
    synth = dup.withColumn("tags", cycle_tags)
    return originals.unionByName(synth)


def exit_road_refs(nodes: DataFrame, ways: DataFrame) -> DataFrame:
    """HighwayHooks exit handling: motorway_junction/services nodes get
    ``mkgmap:osmid``; exits without ``exit:road_ref`` inherit the
    ``ref`` of the lowest-id motorway/trunk way containing them.

    The reference matches by coordinate equality over its in-memory way
    list in insertion order (finishExits:193-201); distributed, the
    natural key is the node reference itself and the deterministic
    winner is the smallest way id with a ref — identical except for
    distinct OSM nodes stacked on the same coordinate, which OSM
    forbids for ways sharing a junction."""
    exits = nodes.filter(
        _tag("highway").isin("motorway_junction", "services"))
    exits = exits.withColumn(
        "tags",
        _with_tags({"mkgmap:osmid": F.col("id").cast("string")}))
    motorway_refs = (
        ways.filter(_tag("highway").isin("motorway", "trunk")
                    & _tag("ref").isNotNull())
        .select(F.col("id").alias("way_id"), _tag("ref").alias("road_ref"),
                F.explode("refs").alias("node_id"))
        .groupBy("node_id")
        .agg(F.min_by("road_ref", F.col("way_id")).alias("road_ref"))
    )
    # exits are the small side; leave strategy to AQE (the ref
    # dimension scales with the road network, never broadcast it)
    joined = exits.join(
        motorway_refs.withColumnRenamed("node_id", "id"), "id", "left")
    needs = _tag("exit:road_ref").isNull() & F.col("road_ref").isNotNull()
    return joined.withColumn(
        "tags",
        F.when(needs, _with_tags({"exit:road_ref": F.col("road_ref")}))
         .otherwise(F.col("tags")),
    ).drop("road_ref")


def apply_highway_hooks(elements: DataFrame,
                        make_opposite_cycleways: bool = False) -> DataFrame:
    """Run the hook chain over a full element table (kind column):
    way rules + cycleway synthesis on ways, exit handling on nodes,
    relations untouched — the OsmReadingHooksChain slice that
    HighwayHooks occupies."""
    kind = F.col("kind")
    ways = elements.filter(kind == "way")
    nodes = elements.filter(kind == "node")
    rest = elements.filter(~kind.isin("way", "node"))
    hooked_ways = highway_hooks_ways(ways, make_opposite_cycleways)
    if make_opposite_cycleways:
        hooked_ways = synthesize_cycleways(hooked_ways)
    exits = exit_road_refs(nodes, ways)
    non_exits = nodes.filter(
        ~F.coalesce(_tag("highway"), F.lit("")).isin(
            "motorway_junction", "services"))
    return hooked_ways.unionByName(exits).unionByName(non_exits) \
        .unionByName(rest)
