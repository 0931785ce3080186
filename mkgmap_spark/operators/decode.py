"""Decode interleaved documents (doc_id, spans) into OSM-style features.

The input table has the BASELINE.json input_hint shape::

    documents(doc_id:string,
              spans:array<struct<kind:string, text:string,
                                 media_ref:string, offset:int>>)

Span conventions (FIXTURES.md §1): 'tag' spans carry "key=value", 'coord'
spans carry "<lat_mu>,<lon_mu>" int map units (1 coord = node, >=2 =
way, first==last = closed polygon), 'member' spans carry
"role:type:doc_id", 'text' free text, 'media' a raster thumb reference.

This is the engine's analogue of mkgmap's readers + ElementSaver
(reader/osm/OsmHandler.java:150-160, ElementSaver.java:49-106): the
way->node coordinate resolution join disappears because coords are
inline; relations keep (role, type, ref) members for the relation-member
join (ElementSaver.java:140-165).

Everything below is Catalyst higher-order functions — filter/transform/
sort_array/map_from_entries run JVM-side inside whole-stage codegen; no
Python touches the rows.  The span-sequence invariant is trivially
preserved: this is a derivation, documents are never rewritten.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..mapunits import MAX_RESOLUTION


def _spans_of(kind: str) -> Column:
    return F.expr(f"filter(spans, s -> s.kind = '{kind}')")


def decode_documents(documents: DataFrame) -> DataFrame:
    """documents -> features(id, kind, tags, lats, lons, closed, members,
    n_text_spans, media_refs, min_res).

    Documents with no coord and no member spans (pure text/media docs)
    are kept with kind='doc' so downstream text/dedup operators can use
    them; the tiling pipeline filters kind != 'doc'.
    """
    # coord spans, ordered by offset (sort_array on leading struct field)
    # try_cast: one malformed span must never fail a 100-TB job — bad
    # coords are dropped like mkgmap skips unparseable input with a log
    # warning (reader/osm/xml/OsmXmlHandler error handling)
    coords = F.expr(
        "filter(transform("
        "  sort_array(transform(filter(spans, s -> s.kind = 'coord'),"
        "                       s -> struct(s.offset as o, s.text as t))),"
        "  p -> struct(try_cast(split(p.t, ',')[0] as int) as lat,"
        "              try_cast(split(p.t, ',')[1] as int) as lon)),"
        " c -> c.lat is not null and c.lon is not null)"
    )
    tags = F.expr(
        "map_from_entries(transform(filter(spans, s -> s.kind = 'tag'),"
        " s -> struct(split(s.text, '=', 2)[0], split(s.text, '=', 2)[1])))"
    )
    members = F.expr(
        "transform("
        "  sort_array(transform(filter(spans, s -> s.kind = 'member'),"
        "                       s -> struct(s.offset as o, s.text as t))),"
        "  m -> struct(split(m.t, ':', 3)[0] as role,"
        "              split(m.t, ':', 3)[1] as mtype,"
        "              cast(regexp_extract(split(m.t, ':', 3)[2], '([0-9]+)', 1) as bigint) as ref))"
    )

    df = (
        documents.withColumn("_coords", coords)
        .withColumn("tags", tags)
        .withColumn("members", members)
        .withColumn("id", F.regexp_extract("doc_id", r"(\d+)", 1).cast("bigint"))
    )

    n_coords = F.size("_coords")
    kind = (
        F.when(F.size("members") > 0, F.lit("relation"))
        .when(n_coords == 1, F.lit("node"))
        .when(n_coords >= 2, F.lit("way"))
        .otherwise(F.lit("doc"))
    )
    closed = F.when(
        (n_coords >= 3)
        & (F.try_element_at("_coords", F.lit(1))["lat"] == F.try_element_at("_coords", F.lit(-1))["lat"])
        & (F.try_element_at("_coords", F.lit(1))["lon"] == F.try_element_at("_coords", F.lit(-1))["lon"]),
        F.lit(True),
    ).otherwise(F.lit(False))

    # per-feature LOD range: the style engine will set this (rules/);
    # fixtures encode it as a mkgmap:min_res tag, default = max resolution
    min_res = F.coalesce(
        F.col("tags").getItem("mkgmap:min_res").cast("int"), F.lit(MAX_RESOLUTION)
    )

    return df.select(
        "id",
        F.col("doc_id"),
        kind.alias("kind"),
        "tags",
        F.expr("transform(_coords, c -> c.lat)").alias("lats"),
        F.expr("transform(_coords, c -> c.lon)").alias("lons"),
        closed.alias("closed"),
        "members",
        F.expr("size(filter(spans, s -> s.kind = 'text'))").alias("n_text_spans"),
        F.expr("transform(filter(spans, s -> s.kind = 'media'), s -> s.media_ref)").alias(
            "media_refs"
        ),
        min_res.alias("min_res"),
    )


def span_sequence_fingerprint(documents: DataFrame) -> DataFrame:
    """Per-document fingerprint of the span sequence.

    Used to verify the per-row invariant (BASELINE.json input_hint):
    surviving documents must keep (kind, text, media_ref) in offset
    order byte-identical.  md5 over the concatenated ordered sequence;
    computed with pure Column ops.
    """
    seq = F.expr(
        "array_join(transform("
        "  sort_array(transform(spans, s -> struct(s.offset as o,"
        "    concat_ws('\\u0001', s.kind, coalesce(s.text, ''), coalesce(s.media_ref, '')) as v))),"
        "  p -> p.v), '\\u0002')"
    )
    return documents.select("doc_id", F.md5(seq).alias("span_fp"))


def parse_delete_tags_spec(text: str) -> tuple[list[str], list[str]]:
    """Parse a delete-tags-file (OsmMapDataSource.readDeleteTagsFile:
    290-327): one ``key=value`` per line, ``key=*`` deletes the key for
    any value; '#'/';' comment lines."""
    star_keys: list[str] = []
    pairs: list[str] = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#") or line.startswith(";"):
            continue
        parts = line.split("=")
        if len(parts) != 2:
            continue  # reference logs and skips bad lines
        k, v = parts[0].strip(), parts[1].strip()
        if v == "*":
            star_keys.append(k)
        else:
            pairs.append(f"{k}={v}")
    return star_keys, pairs


def delete_tags_filter(
    df: DataFrame, spec: str, tags_col: str = "tags", delete_fixme: bool = True
) -> DataFrame:
    """The scan-time delete-tags-file filter (OsmHandler.keepTag:
    102-124): drop configured key=value pairs (or whole keys for
    ``key=*``) from every element's tag map, plus — mirroring the
    reference's setDeleteFixmeValues — values matching the FIXME
    pattern ``(?i)fix[ _]?+me`` (>= 5 chars) unless the KEY itself is
    fixme.  Pure map_filter Columns; Catalyst prunes before the rule
    engine ever sees the tags."""
    star_keys, pairs = parse_delete_tags_spec(spec)
    col = F.col(tags_col)

    def keep(k: Column, v: Column) -> Column:
        cond = F.lit(True)
        if star_keys:
            cond = cond & ~k.isin(*star_keys)
        if pairs:
            cond = cond & ~F.concat(k, F.lit("="), v).isin(*pairs)
        if delete_fixme:
            fixme_val = (F.length(v) >= 5) & v.rlike(r"^(?i)fix[ _]?+me$") & ~k.isin("fixme", "FIXME")
            cond = cond & ~fixme_val
        return cond

    return df.withColumn(tags_col, F.map_filter(col, keep))


def prune_unused_tags(
    df: DataFrame, keep_keys, tags_col: str = "tags"
) -> DataFrame:
    """Keep only the tags a ruleset READS (RuleSet.getUsedTags-driven
    pruning — the reference drops unused tags after style load so
    element memory stays bounded).  ``keep_keys`` is typically
    ``rules.used_tags(ruleset) | style.extra_used_tags``; the mkgmap:*
    namespace always survives (set by earlier stages, read later).

    Pure map_filter Columns — at scan time this shrinks the tag map
    BEFORE the rule-engine fold ever copies it through the
    accumulator, which is the dominant width at 100-TB inputs.

    Parity note: like the reference (ValueBuilder.getUsedTags only
    collects template tag names; OsmHandler.keepTag then drops
    everything outside the set), a tag read ONLY through a filter
    argument (e.g. ``not-contained:;:route_ref``) is not in the read
    set — both engines prune it identically."""
    keys = sorted(set(keep_keys))
    col = F.col(tags_col)
    return df.withColumn(
        tags_col,
        F.map_filter(
            col,
            lambda k, v: k.isin(*keys) | k.startswith("mkgmap:") if keys
            else k.startswith("mkgmap:"),
        ),
    )
