"""Host-side audio I/O and signal heuristics (decode, chunk, crop, rank)."""
