"""Structured Streaming surface (SURVEY §2.9): the reference's
file-per-second sensor arrival, per-period scoring, and anomaly-episode
detection re-expressed as streams. Batch and streaming share the same
operator library — the streaming modules only add sources, watermarks,
and window/session specs."""
