"""Sources: transcript table generator/reader and table IO abstractions."""
