"""Dataflow operators: index build, query engines, dedup, similarity."""
