"""Sources: synthetic pages corpus + table readers (parquet seam)."""
