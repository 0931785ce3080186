"""Smoke the flagship scaling job (plans/bench_job.py) end-to-end on a
tiny corpus: every stage (decode checkpoint, doc features, PIP join,
quadtree split, assignment) runs inside one process and the metrics
contract scripts/scaling_bench.py consumes stays intact."""

from __future__ import annotations

import os


def test_bench_job_end_to_end(tmp_path):
    from mkgmap_spark.fixtures.bulk import write_bulk_corpus
    from mkgmap_spark.plans.bench_job import run

    corpus = str(tmp_path / "docs")
    write_bulk_corpus(corpus, 5000, seed=7)
    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)

    res = run(cpus=2, corpus=corpus, out_dir=out)

    assert res["n_docs"] == 5000
    assert res["n_features"] == 5000
    assert res["n_tiles"] > 0
    for k in ("t_decode_s", "t_docfeat_s", "t_pip_s", "t_split_s", "t_assign_write_s"):
        assert res[k] >= 0
    assert res["wall_s"] > 0 and res["docs_per_sec"] > 0
    # the sinks the resume/lineage story depends on all exist
    for d in ("doc_features", "located", "membership", "tiles", "checkpoints"):
        assert os.path.isdir(os.path.join(out, d)), d
