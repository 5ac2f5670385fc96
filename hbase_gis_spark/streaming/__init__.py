"""Structured Streaming operators (the reference has no streaming —
SURVEY.md §2 'explicitly absent'; these extend the engine to the
streaming shapes a training-data pipeline needs)."""
