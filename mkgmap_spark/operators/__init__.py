"""DataFrame operators: decode, tiling, spatial joins, merges, dedup,
similarity, text analysis.  Each module cites the reference semantics it
re-expresses (file:line into /root/reference)."""
