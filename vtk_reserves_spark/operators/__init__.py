"""Query operators: breakdown aggregation, spatial flags, dedup, similarity."""
