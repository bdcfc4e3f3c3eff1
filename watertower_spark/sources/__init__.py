"""Corpus sources: deterministic synthetic generator, reference fixtures,
driver-table adapter, and the index table catalog."""
