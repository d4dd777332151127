"""Relational + pandas-UDF operators: rollup, gapfill, search, compress."""
