"""Operators: enrichment joins, decode transforms, aggregations."""
