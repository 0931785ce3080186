"""Independent single-threaded pure-Python golden oracles.

These deliberately avoid the engine's histogram machinery: they work
element-at-a-time, the way the reference does, so a test failure means
the distributed implementation diverged from the documented semantics.
"""
