"""Deterministic synthetic fixtures (seeded, no external data)."""

from .generator import generate_documents, generate_boundaries, generate_raster_thumbs, write_fixture_tables  # noqa: F401
