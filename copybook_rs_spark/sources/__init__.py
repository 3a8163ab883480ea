"""Sources: deterministic token-table derivation from the driver's parquet
testdata, seeded synthetic fixture generators, and the chunk/manifest table
schemas (SURVEY.md §2.1)."""
