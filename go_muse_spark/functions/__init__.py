"""Column-level helper functions (text analysis, vector math, hashing)."""
