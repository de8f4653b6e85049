"""Experimental components: measured, correctness-tested, but NOT in any
hot path.  Each module documents why it is here and what would promote
it (see BENCHMARKS.md for the measured rows)."""
