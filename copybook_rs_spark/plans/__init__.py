"""Driver-side planning: skew-aware salting and the deterministic partition
plan (SURVEY.md §4 — the only 'planner' code we write; Catalyst does the
rest)."""
