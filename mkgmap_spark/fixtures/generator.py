"""Deterministic generator for the interleaved documents corpus.

Produces the exact BASELINE.json ``input_hint`` shape:
    documents(doc_id:string, spans:array<struct<kind,text,media_ref,offset>>)
plus the auxiliary tables from FIXTURES.md (boundaries, raster_thumbs).

Design goals:
- seeded numpy RandomState — same seed, same bytes, any machine;
- clustered hot-spots: N_HOT "urban" centres hold HOT_FRACTION of all
  documents inside ~1% of the covered area, so the tiling engine's
  skew-refinement path is exercised at every scale;
- interleaving: documents mix tag/coord/text/media spans with strictly
  increasing offsets (the span-sequence invariant's subject).

The generator builds pyarrow tables directly (no Spark dependency) so
pytest can synthesize small corpora in milliseconds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# world window for fixtures: a ~20x20 degree region in map units
LAT0, LAT1 = -500_000, 500_000
LON0, LON1 = -500_000, 500_000

N_HOT = 8
HOT_FRACTION = 0.30

_WORDS = (
    "river road bridge park lane high main church mill green north south "
    "east west old new upper lower market station school farm hill wood"
).split()

_HIGHWAYS = ["primary", "secondary", "residential", "footway", "track", "service"]


SPANS_TYPE = pa.list_(
    pa.struct(
        [
            pa.field("kind", pa.string()),
            pa.field("text", pa.string()),
            pa.field("media_ref", pa.string()),
            pa.field("offset", pa.int32()),
        ]
    )
)


def _positions(rng: np.random.RandomState, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Skewed point field: HOT_FRACTION of points in tight clusters."""
    hot_cy = rng.randint(LAT0 // 2, LAT1 // 2, size=N_HOT)
    hot_cx = rng.randint(LON0 // 2, LON1 // 2, size=N_HOT)
    n_hot = int(n * HOT_FRACTION)
    which = rng.randint(0, N_HOT, size=n_hot)
    spread = (LAT1 - LAT0) // 200  # ~0.5% of extent per axis
    hy = hot_cy[which] + rng.randint(-spread, spread, size=n_hot)
    hx = hot_cx[which] + rng.randint(-spread, spread, size=n_hot)
    cy = rng.randint(LAT0, LAT1, size=n - n_hot)
    cx = rng.randint(LON0, LON1, size=n - n_hot)
    lat = np.concatenate([hy, cy])
    lon = np.concatenate([hx, cx])
    perm = rng.permutation(n)
    return lat[perm].astype(np.int64), lon[perm].astype(np.int64)


def generate_documents(n_docs: int, seed: int = 42) -> pa.Table:
    """Build the documents table. Mix: 55% nodes, 25% ways (20% of which
    closed shapes), 5% relations, 15% pure text/media docs."""
    rng = np.random.RandomState(seed)
    lat, lon = _positions(rng, n_docs)

    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []

    roles = ["outer", "inner", "via", "from", "to"]
    kinds_draw = rng.rand(n_docs)
    way_len_draw = rng.randint(2, 24, size=n_docs)
    closed_draw = rng.rand(n_docs)
    media_draw = rng.rand(n_docs)
    text_draw = rng.rand(n_docs)
    minres_draw = rng.rand(n_docs)

    for i in range(n_docs):
        spans: list[dict] = []
        off = 0

        def add(kind: str, text: str | None, media_ref: str | None = None):
            nonlocal off
            spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": off})
            off += 1

        r = kinds_draw[i]
        name = " ".join(
            _WORDS[j] for j in rng.randint(0, len(_WORDS), size=2)
        )
        if r < 0.55:  # node
            add("tag", f"name={name}")
            if rng.rand() < 0.5:
                add("tag", "amenity=post_box")
            if text_draw[i] < 0.3:
                add("text", f"A note about {name}.")
            add("coord", f"{lat[i]},{lon[i]}")
        elif r < 0.80:  # way / shape
            m = int(way_len_draw[i])
            closed = closed_draw[i] < 0.20 and m >= 3
            add("tag", f"highway={_HIGHWAYS[int(rng.randint(0, len(_HIGHWAYS)))]}")
            add("tag", f"name={name}")
            if minres_draw[i] < 0.25:
                add("tag", f"mkgmap:min_res={int(rng.choice([16, 18, 20, 22]))}")
            step = rng.randint(-400, 400, size=(m, 2))
            ys = lat[i] + np.cumsum(step[:, 0])
            xs = lon[i] + np.cumsum(step[:, 1])
            if text_draw[i] < 0.15:
                add("text", f"The way called {name}.")
            for j in range(m):
                add("coord", f"{int(ys[j])},{int(xs[j])}")
            if closed:
                add("coord", f"{int(ys[0])},{int(xs[0])}")
        elif r < 0.85:  # relation
            add("tag", "type=multipolygon")
            n_mem = int(rng.randint(2, 5))
            for _ in range(n_mem):
                ref = int(rng.randint(0, n_docs))
                add("member", f"{roles[int(rng.randint(0, len(roles)))]}:way:doc-{ref:08d}")
        else:  # pure text / media doc
            add("text", f"{name} " * int(rng.randint(1, 6)))
            if media_draw[i] < 0.6:
                cell = int(lat[i] >> 16)
                add("media", f"{int(rng.choice([64, 128]))}x{int(rng.choice([64, 128]))}",
                    f"thumb://{cell}/{i % 97}")
            if rng.rand() < 0.3:
                add("text", f"More prose mentioning {name}.")
            # ~half of pure docs still carry a location (geo-tagged doc)
            if rng.rand() < 0.5:
                add("coord", f"{lat[i]},{lon[i]}")

        doc_ids.append(f"doc-{i:08d}")
        spans_col.append(spans)

    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(spans_col, SPANS_TYPE),
        }
    )


def generate_boundaries(k: int = 4, seed: int = 43) -> pa.Table:
    """k*k lattice of admin polygons + nested/hole cases (FIXTURES.md §3)."""
    rng = np.random.RandomState(seed)
    ids, levels, names, postcodes, rings_col = [], [], [], [], []

    def ring(min_y, min_x, max_y, max_x):
        return {
            "lats": [min_y, min_y, max_y, max_y, min_y],
            "lons": [min_x, max_x, max_x, min_x, min_x],
            "is_hole": False,
        }

    h = (LAT1 - LAT0) // k
    w = (LON1 - LON0) // k
    b = 0
    for gy in range(k):
        for gx in range(k):
            y0, x0 = LAT0 + gy * h, LON0 + gx * w
            ids.append(f"b{b:04d}")
            levels.append(4)
            names.append(f"county_{gy}_{gx}")
            postcodes.append(f"PC{gy}{gx}")
            rings_col.append([ring(y0, x0, y0 + h, x0 + w)])
            b += 1
            # one nested level-8 box with a hole inside some cells
            if (gy + gx) % 3 == 0:
                iy0 = y0 + h // 4
                ix0 = x0 + w // 4
                outer = ring(iy0, ix0, iy0 + h // 2, ix0 + w // 2)
                hole = {
                    "lats": [iy0 + h // 3, iy0 + h // 3, iy0 + h // 2 - h // 8,
                             iy0 + h // 2 - h // 8, iy0 + h // 3],
                    "lons": [ix0 + w // 3, ix0 + w // 2 - w // 8, ix0 + w // 2 - w // 8,
                             ix0 + w // 3, ix0 + w // 3],
                    "is_hole": True,
                }
                ids.append(f"b{b:04d}")
                levels.append(8)
                names.append(f"town_{gy}_{gx}")
                postcodes.append(f"PT{gy}{gx}")
                rings_col.append([outer, hole])
                b += 1

    rings_type = pa.list_(
        pa.struct(
            [
                pa.field("lats", pa.list_(pa.int32())),
                pa.field("lons", pa.list_(pa.int32())),
                pa.field("is_hole", pa.bool_()),
            ]
        )
    )
    return pa.table(
        {
            "boundary_id": pa.array(ids),
            "admin_level": pa.array(levels, pa.int32()),
            "name": pa.array(names),
            "postcode": pa.array(postcodes),
            "rings": pa.array(rings_col, rings_type),
        }
    )


def generate_raster_thumbs(documents: pa.Table, seed: int = 44) -> pa.Table:
    """One raster tile per distinct media_ref in the documents table.

    Pixels = deterministic gradient + seeded noise (HGT stand-in,
    FIXTURES.md §4)."""
    rng = np.random.RandomState(seed)
    refs: set[tuple[str, int, int]] = set()
    for spans in documents.column("spans").to_pylist():
        for s in spans:
            if s["kind"] == "media" and s["media_ref"]:
                w, h = (int(v) for v in s["text"].split("x"))
                refs.add((s["media_ref"], w, h))
    media_ref, cell_id, width, height, pixels = [], [], [], [], []
    for ref, w, h in sorted(refs):
        cell = int(ref.split("//")[1].split("/")[0])
        yy, xx = np.mgrid[0:h, 0:w]
        base = (yy * 3 + xx * 5) % 251
        noise = rng.randint(0, 17, size=(h, w))
        media_ref.append(ref)
        cell_id.append(cell)
        width.append(w)
        height.append(h)
        pixels.append((base + noise).astype(np.int32).ravel().tolist())
    return pa.table(
        {
            "media_ref": pa.array(media_ref),
            "cell_id": pa.array(cell_id, pa.int64()),
            "width": pa.array(width, pa.int32()),
            "height": pa.array(height, pa.int32()),
            "pixels": pa.array(pixels, pa.list_(pa.int32())),
        }
    )


def write_fixture_tables(out_dir: str, n_docs: int = 2000, seed: int = 42, k_boundaries: int = 4) -> dict[str, str]:
    """Write documents/boundaries/raster_thumbs parquet under out_dir."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    docs = generate_documents(n_docs, seed=seed)
    paths = {}
    for name, tbl in (
        ("documents_spans", docs),
        ("boundaries", generate_boundaries(k=k_boundaries, seed=seed + 1)),
        ("raster_thumbs", generate_raster_thumbs(docs, seed=seed + 2)),
    ):
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p)
        paths[name] = p
    return paths
