"""End-to-end pipelines and checkpoint/lineage support."""
