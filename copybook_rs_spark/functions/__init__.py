"""Column-level functions: projection dependency closure, condition
predicates, run-count expressions (SURVEY.md §2.2, §2.5, §2.8)."""

from copybook_rs_spark.functions.projection import project_columns  # noqa: F401
from copybook_rs_spark.functions.exprs import (  # noqa: F401
    RUNS_PER_DOC_DUCKDB,
    RUNS_PER_DOC_SPARK,
    condition,
)
