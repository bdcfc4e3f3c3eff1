"""Column-level building blocks: posting-list codec and text functions."""
