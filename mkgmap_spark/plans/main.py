"""The Main-equivalent front door: argv -> per-file tile builds.

Reference: mkgmap/Main.java drives CommandArgsReader; each input file
is converted with the options in force at its position (style, levels,
code page, mapname), then the combiner stage (tdbfile / gmapsupp)
aggregates the per-file outputs.  This module wires the same flow
through the engine: plans/command_args.read_args picks the files +
option snapshots, sources/* read the file by extension, the style
engine resolves Garmin types (node -> points rules, open way -> lines
rules, closed way -> lines+polygons per StyledConverter:336-349 /
StyleImpl.getWayRules), and build_tiles_from_features runs the
quadtree.  Combiner manifests come from plans/combiners when the
corresponding flag options are present.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..rules import compile_rules
from ..rules.style import Style, load_style, parse_level_spec
from .command_args import FileArgs, read_args
from .pipeline import (
    TileBuildResult,
    build_tiles_from_features,
    elements_to_features,
)


def read_input(spark: SparkSession, path: str) -> DataFrame:
    """Dispatch an input file to its reader by extension (the
    reader/osm plugin selection of the reference)."""
    lower = path.lower()
    if lower.endswith((".osm", ".osm.gz", ".osm.bz2")):
        from ..sources.osm_xml import read_osm_xml

        return read_osm_xml(spark, path)
    if lower.endswith(".o5m"):
        from ..sources.o5m import read_o5m

        return read_o5m(spark, path)
    if lower.endswith((".pbf", ".osm.pbf")):
        from ..sources.pbf import read_pbf

        return read_pbf(spark, path)
    if lower.endswith((".mp", ".mp.gz")):
        from ..sources.polish import read_polish

        return read_polish(spark, path)
    raise ValueError(f"unrecognised input format: {path}")


def apply_name_tag_list(df: DataFrame, name_tags: list[str]) -> DataFrame:
    """--name-tag-list (NameFinder.setNameWithNameTagList): the first
    set tag of the list becomes the ``name`` tag (replacing any
    existing name unless the winner IS ``name``)."""
    if not name_tags or name_tags == ["name"]:
        return df
    first = F.coalesce(*[F.col("tags").getItem(t) for t in name_tags])
    return df.withColumn(
        "tags",
        F.when(
            first.isNotNull(),
            F.map_concat(
                F.map_filter(F.col("tags"), lambda k, v: k != F.lit("name")),
                F.map_from_arrays(F.array(F.lit("name")), F.array(first)),
            ),
        ).otherwise(F.col("tags")),
    )


def style_option_tags(style_option: str) -> dict[str, str]:
    """--style-option=car;farms=more -> the mkgmap:option:* tags added
    to every element before style processing
    (StyledConverter.parseStyleOption)."""
    out: dict[str, str] = {}
    for t in style_option.split(";"):
        if not t:
            continue
        pair = t.split("=")
        out["mkgmap:option:" + pair[0]] = pair[1] if len(pair) > 1 else "true"
    return out


def styled_features(
    elements: DataFrame,
    style: Style,
    prune: bool = True,
    name_tags: list[str] | None = None,
    style_option: str | None = None,
) -> DataFrame:
    """Elements -> styled features with the reference's rule-file
    routing: nodes through points rules; open ways (or <4 points)
    through lines rules; closed ways through lines+polygons.

    ``prune`` drops tags no rule file reads (RuleSet.getUsedTags +
    the style's extra-used-tags) before the style fold — identical
    output, much narrower tag maps through the shuffle."""
    feats = elements_to_features(elements)  # min_res=24 placeholder
    if style_option:
        opts = style_option_tags(style_option)
        if opts:
            keys = list(opts)
            feats = feats.withColumn(
                "tags",
                F.map_concat(
                    F.map_filter(F.col("tags"), lambda k, v: ~k.isin(*keys)),
                    F.map_from_arrays(
                        F.array(*[F.lit(k) for k in keys]),
                        F.array(*[F.lit(opts[k]) for k in keys]),
                    ),
                ),
            )
    if name_tags:
        feats = apply_name_tag_list(feats, name_tags)

    if prune:
        from ..operators.decode import prune_unused_tags
        from ..rules import used_tags

        keep = set(style.extra_used_tags) | set(name_tags or [])
        for rl in style.rules.values():
            keep |= used_tags(rl)
        feats = prune_unused_tags(feats, keep)
    # relation rules run next (StyledConverter.convertRelation
    # before convertWay/convertNode): apply/apply_once pushes mutate
    # member tags before way/node styling sees them.  Scan-time
    # pruning above is safe — pushed tags land AFTER it, and the keep
    # set already covers every tag any rule file (incl. relations)
    # reads, so member styling still sees the pushes.
    rel_rules = style.rules.get("relations", [])
    if rel_rules and "members" in elements.columns:
        rels = elements.filter(
            (F.col("kind") == "relation") & (F.size("members") > 0)
        ).select("id", "tags", "members")
        if rels.limit(1).count() > 0:
            from ..operators.relations import apply_pushed_to_members

            rel_out = compile_rules(
                rel_rules,
                rels,
                id_col="id",
                is_relation=True,
                with_pushed=True,
            )
            feats = apply_pushed_to_members(
                rels.select("id", "members"),
                feats,
                rel_rules,
                relations_out=rel_out,
            )

    def styled(df: DataFrame, rules) -> DataFrame:
        if not rules:
            return df.limit(0)
        out = compile_rules(rules, df, kind_col="kind", id_col="id")
        return (
            out.filter(F.size("results") > 0)
            .withColumn(
                "min_res", F.expr("array_min(transform(results, r -> r.min_res))")
            )
            .select(
                "id", "kind", F.col("tags_out").alias("tags"),
                "lats", "lons", "closed", "min_res",
            )
        )

    nodes = feats.filter(F.col("kind") == "node")
    ways = feats.filter(F.col("kind") == "way")
    closed = F.col("closed") & (F.size("lats") >= 4)
    open_ways = ways.filter(~closed)
    closed_ways = ways.filter(closed)

    points_rules = style.rules.get("points", [])
    lines_rules = style.rules.get("lines", [])
    way_rules = lines_rules + style.rules.get("polygons", [])

    return (
        styled(nodes, points_rules)
        .unionByName(styled(open_ways, lines_rules))
        .unionByName(styled(closed_ways, way_rules))
    )


def list_styles(style_file: str) -> list[tuple[str, str, str]]:
    """--list-styles: (name, version, summary) for every style under a
    style-file directory (StyleImpl.readStyles)."""
    out = []
    for name in sorted(os.listdir(style_file)):
        d = os.path.join(style_file, name)
        if not os.path.isdir(d):
            continue
        try:
            s = load_style(d, name)
        except ValueError:
            continue  # not a style directory
        out.append(
            (name, s.info.get("version", ""), s.info.get("summary", ""))
        )
    return out


@dataclass
class FileBuild:
    args: FileArgs
    features: DataFrame
    tiles: TileBuildResult
    dem_tiles: DataFrame | None = None
    dem_sections: DataFrame | None = None


@dataclass
class RunResult:
    builds: list[FileBuild]
    tdb: DataFrame | None = None
    gmapsupp: DataFrame | None = None


def build_dem_for_features(spark: SparkSession, feats: DataFrame,
                           dem_dirs: list[str], dem_dists: list[int],
                           interpolation: str = "auto",
                           poly_path: str | None = None,
                           outside_height: int | None = None):
    """--dem / --dem-dists: derive the feature bbox, load the HGT
    coverage for the EXTRA-widened area, and run the elevation build
    (plan levels, carve tile grids, sample, encode) — the DEMFile.calc
    flow with the bbox taken from the converted features.

    ``poly_path`` (--dem-poly, an Osmosis .poly file) clips the lattice
    to the polygon with MapBuilder.java:326-333's guard: the polygon
    only applies when it intersects — but does not fully contain — the
    tile rect widened by 2 map units.  ``outside_height``
    (--dem-outside-polygon) is the elevation written outside it,
    default the void value (HGTReader.UNDEF)."""
    import math

    from ..mapunits import to_degrees, to_map_unit
    from ..operators.dem import _UNDEF, EXTRA, build_dem, load_hgt_grids

    bounds = feats.select(
        F.min(F.expr("array_min(lats)")).alias("min_lat"),
        F.max(F.expr("array_max(lats)")).alias("max_lat"),
        F.min(F.expr("array_min(lons)")).alias("min_lon"),
        F.max(F.expr("array_max(lons)")).alias("max_lon"),
    ).collect()[0]
    if bounds.min_lat is None:
        return None, None
    min_lat_deg = max(int(math.floor(to_degrees(bounds.min_lat) - EXTRA)), -90)
    min_lon_deg = max(int(math.floor(to_degrees(bounds.min_lon) - EXTRA)), -180)
    max_lat_deg = min(int(math.ceil(to_degrees(bounds.max_lat) + EXTRA)), 90)
    max_lon_deg = min(int(math.ceil(to_degrees(bounds.max_lon) + EXTRA)), 180)
    grids = load_hgt_grids(dem_dirs, min_lat_deg, min_lon_deg,
                           max_lat_deg, max_lon_deg)
    poly_rings = None
    if poly_path:
        from ..sources.polyfile import read_poly, rect_poly_relation

        rings = read_poly(poly_path)
        # MapBuilder widens the tile rect by 2 MAP UNITS (a Rectangle2D
        # in map units, MapBuilder.java:329-330) and clips only when
        # the polygon intersects but does not contain it
        pad = 2
        rel = rect_poly_relation(
            rings,
            int(bounds.min_lat) - pad, int(bounds.min_lon) - pad,
            int(bounds.max_lat) + pad, int(bounds.max_lon) + pad)
        if rel == 1:
            poly_rings = rings
    tiles, sections, _tre = build_dem(
        spark, grids, int(bounds.min_lat), int(bounds.min_lon),
        int(bounds.max_lat), int(bounds.max_lon), dem_dists,
        outside_height=_UNDEF if outside_height is None else outside_height,
        interpolation=interpolation, poly_rings=poly_rings)
    return tiles, sections


def run_from_args(spark: SparkSession, argv: list[str]) -> RunResult:
    """Process an mkgmap-style command line end-to-end.

    Recognised options per file: --style-file=DIR [--style=name],
    --levels=spec; global combiner flags: --tdbfile, --gmapsupp."""
    parsed = read_args(argv)
    builds: list[FileBuild] = []
    for fa in parsed.files:
        if fa.name.startswith("test-map:"):
            # synthetic test maps bypass styling — they emit typed
            # features directly (ElementTestDataSource)
            from ..sources.test_source import all_elements, test_points

            which = fa.name.split(":", 1)[1]
            if which == "all-elements":
                feats = all_elements(spark)
            elif which == "test-points":
                feats = test_points(spark, npoints=int(fa.get("npoints", "10")))
            else:
                raise ValueError(f"unknown test map: {fa.name}")
            levels = ((0, 24),)
            if fa.get("levels"):
                levels = tuple(parse_level_spec(fa.get("levels")))
            tiles = build_tiles_from_features(spark, feats, levels=levels)
            builds.append(FileBuild(fa, feats, tiles))
            continue
        elements = read_input(spark, fa.name)
        # reading hooks run before styling (OsmReadingHooksChain):
        # roundabout oneway + exit refs always, cycleway synthesis by option
        from ..operators.highway_hooks import apply_highway_hooks

        make_opp = (fa.get("make-opposite-cycleways") is not None
                    or fa.get("make-all-cycleways") is not None)
        elements = apply_highway_hooks(elements, make_opp)
        style_file = fa.get("style-file")
        if style_file:
            style_dir = style_file
            if fa.get("style"):
                style_dir = os.path.join(style_file, fa.get("style"))
            style = load_style(style_dir)
            name_tags = None
            if fa.get("name-tag-list"):
                import re as _re

                name_tags = [
                    t for t in _re.split(r"[,\s]+", fa.get("name-tag-list")) if t
                ]
            feats = styled_features(
                elements,
                style,
                name_tags=name_tags,
                style_option=fa.get("style-option"),
            )
            levels = tuple(style.levels)
        else:
            feats = elements_to_features(elements)
            levels = ((0, 24),)
        if fa.get("levels"):
            levels = tuple(parse_level_spec(fa.get("levels")))
        tiles = build_tiles_from_features(spark, feats, levels=levels)
        fb = FileBuild(fa, feats, tiles)
        if fa.get("dem"):
            # reference default is "-1" (MapBuilder.java:217): derive
            # the lattice distance from the best available HGT
            # resolution (dem_level_plan's auto path)
            dists = [int(x) for x in
                     (fa.get("dem-dists") or "-1").split(",") if x.strip()]
            outside = fa.get("dem-outside-polygon")
            fb.dem_tiles, fb.dem_sections = build_dem_for_features(
                spark, feats, fa.get("dem").split(","), dists,
                interpolation=fa.get("dem-interpolation", "auto"),
                poly_path=fa.get("dem-poly") or None,
                outside_height=int(outside) if outside else None)
        builds.append(fb)

    result = RunResult(builds)
    opts = parsed.options
    if builds and ("tdbfile" in opts or "gmapsupp" in opts):
        from .combiners import gmapsupp_layout, tdb_manifest

        first = builds[0].tiles
        tiles_df = first.tiles
        members = first.membership
        for b in builds[1:]:
            tiles_df = tiles_df.unionByName(b.tiles.tiles)
            members = members.unionByName(b.tiles.membership)
        mapname_base = int(opts.get("overview-mapnumber", "63240000"))
        manifest = tdb_manifest(tiles_df, members, mapname_base=mapname_base + 1)
        if "tdbfile" in opts:
            result.tdb = manifest
        if "gmapsupp" in opts:
            result.gmapsupp = gmapsupp_layout(manifest)
    return result
