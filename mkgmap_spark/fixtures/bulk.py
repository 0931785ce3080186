"""Vectorized bulk corpus generator for bench-scale runs (millions of
documents in seconds).

Same ``documents(doc_id, spans)`` schema as generator.py, built from
flat numpy arrays + one pyarrow ListArray from offsets — no per-doc
Python loop.  Mix: 60% nodes (1 coord + 1 tag), 25% ways (tag + k
coords), 15% text docs (text + optional media + coord).  Skewed like
FIXTURES.md: N_HOT clusters hold HOT_FRACTION of docs in ~1% of the
area.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .generator import LAT0, LAT1, LON0, LON1, N_HOT, HOT_FRACTION, SPANS_TYPE


def generate_documents_bulk(n_docs: int, seed: int = 42, chunk: int = 250_000) -> pa.Table:
    batches = []
    done = 0
    i0 = 0
    while done < n_docs:
        n = min(chunk, n_docs - done)
        batches.append(_chunk(n, seed + len(batches), i0))
        i0 += n
        done += n
    return pa.concat_tables(batches)


def _chunk(n: int, seed: int, id_base: int) -> pa.Table:
    rng = np.random.RandomState(seed)

    # positions (vectorized twin of generator._positions)
    hot_cy = rng.randint(LAT0 // 2, LAT1 // 2, size=N_HOT)
    hot_cx = rng.randint(LON0 // 2, LON1 // 2, size=N_HOT)
    n_hot = int(n * HOT_FRACTION)
    which = rng.randint(0, N_HOT, size=n_hot)
    spread = (LAT1 - LAT0) // 200
    lat = np.concatenate([
        hot_cy[which] + rng.randint(-spread, spread, size=n_hot),
        rng.randint(LAT0, LAT1, size=n - n_hot),
    ]).astype(np.int64)
    lon = np.concatenate([
        hot_cx[which] + rng.randint(-spread, spread, size=n_hot),
        rng.randint(LON0, LON1, size=n - n_hot),
    ]).astype(np.int64)
    perm = rng.permutation(n)
    lat, lon = lat[perm], lon[perm]

    r = rng.rand(n)
    is_node = r < 0.60
    is_way = (r >= 0.60) & (r < 0.85)
    is_doc = ~(is_node | is_way)
    way_len = np.where(is_way, rng.randint(2, 12, size=n), 0)
    has_note = is_node & (rng.rand(n) < 0.3)

    # realistic text payloads: pure text docs carry ~120 words, 30% of
    # nodes carry a ~16-word note span — the 100-TB corpus is
    # text+media, so per-doc text processing dominates raw scan bytes
    vocab = np.array(
        "the of and to in is that for with was river road bridge park lane high main "
        "church mill green north south east west old new upper lower market station "
        "school farm hill wood stone cross bank field gate spring brook dale moor "
        "data span tile cell index layer region vector raster corpus".split()
    )
    text_len = np.where(is_doc, 120, np.where(has_note, 16, 0))
    word_idx_all = rng.randint(0, len(vocab), size=int(text_len.sum()))
    text_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(text_len, out=text_offsets[1:])
    texts = np.empty(n, dtype=object)
    vw = vocab[word_idx_all]
    for i in np.flatnonzero(text_len):
        texts[i] = " ".join(vw[text_offsets[i] : text_offsets[i + 1]])

    # span layout: slot0 = tag (geo) or text (doc); note nodes add a
    # text span at slot1; all remaining slots are coords
    n_spans = np.where(
        is_node, 2 + has_note.astype(np.int64), np.where(is_way, 1 + way_len, 2)
    ).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_spans, out=offsets[1:])
    total = int(offsets[-1])

    kind = np.empty(total, dtype=object)
    text = np.empty(total, dtype=object)

    first = offsets[:-1]
    kind[first] = "tag"
    kind[first[is_doc]] = "text"
    hw = np.array(["highway=primary", "highway=residential", "highway=track", "amenity=post_box"])
    tag_txt = hw[rng.randint(0, len(hw), size=n)]
    text[first] = np.where(is_doc, texts, tag_txt)

    note_slots = (first + 1)[has_note]
    kind[note_slots] = "text"
    text[note_slots] = texts[has_note]

    coord_mask = np.ones(total, dtype=bool)
    coord_mask[first] = False
    coord_mask[note_slots] = False

    doc_of = np.repeat(np.arange(n), n_spans)
    pos = np.arange(total) - np.repeat(offsets[:-1], n_spans)
    step_y = rng.randint(-400, 400, size=total)
    step_x = rng.randint(-400, 400, size=total)
    span_lat = lat[doc_of] + np.where(pos > 1, step_y * (pos - 1), 0)
    span_lon = lon[doc_of] + np.where(pos > 1, step_x * (pos - 1), 0)
    cm = coord_mask
    kind[cm] = "coord"
    lat_s = span_lat[cm].astype(str)
    lon_s = span_lon[cm].astype(str)
    text[cm] = np.char.add(np.char.add(lat_s, ","), lon_s)

    media_ref = np.full(total, None, dtype=object)
    offs = pos.astype(np.int32)

    ids = np.char.add("doc-", np.char.zfill((id_base + np.arange(n)).astype(str), 8))

    spans_struct = pa.StructArray.from_arrays(
        [
            pa.array(kind, pa.string()),
            pa.array(text, pa.string()),
            pa.array(media_ref, pa.string()),
            pa.array(offs, pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    spans = pa.ListArray.from_arrays(pa.array(offsets, pa.int64()).cast(pa.int32()), spans_struct)
    return pa.table({"doc_id": pa.array(ids, pa.string()), "spans": spans.cast(SPANS_TYPE)})


def write_bulk_corpus(path: str, n_docs: int, seed: int = 42, docs_per_file: int = 12_500) -> str:
    """Write the corpus as a directory of parquet files (one per chunk)
    so the Spark scan parallelizes across input splits regardless of
    spark.sql.files.maxPartitionBytes."""
    import os

    os.makedirs(path, exist_ok=True)
    done = 0
    part = 0
    while done < n_docs:
        n = min(docs_per_file, n_docs - done)
        tbl = _chunk(n, seed + part, done)
        pq.write_table(tbl, os.path.join(path, f"part-{part:05d}.parquet"), row_group_size=docs_per_file)
        done += n
        part += 1
    return path
