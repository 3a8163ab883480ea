"""Driver-contract consistency checks that need no Spark session: the
query registry, its oracle coverage, and the documented counts must agree
so COVERAGE.md can never silently drift from __spark_entry__.py again
(round-3 VERDICT found the Notes paragraph three queries stale)."""

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as ent  # noqa: E402


def test_every_oracle_key_has_a_query():
    qs, osql = ent.queries(), ent.oracle_sql()
    assert set(osql) <= set(qs), sorted(set(osql) - set(qs))


def test_coverage_md_counts_match_registry():
    qs, osql = ent.queries(), ent.oracle_sql()
    text = (REPO / "COVERAGE.md").read_text()
    m = re.search(
        r"(\d+) driver queries total: (\d+) with exact DuckDB oracles, "
        r"(\d+) rows-only",
        text,
    )
    assert m, "COVERAGE.md Notes must state the query counts"
    total, oracled, rows_only = (int(g) for g in m.groups())
    assert total == len(qs), (total, len(qs))
    assert oracled == len(osql), (oracled, len(osql))
    assert rows_only == len(qs) - len(osql), (rows_only, len(qs) - len(osql))


def test_rows_only_set_is_the_documented_one():
    # rows-only queries are a deliberate, named exception list — adding a
    # query without an oracle must be a conscious decision here
    qs, osql = ent.queries(), ent.oracle_sql()
    assert set(qs) - set(osql) == {"ann_lsh_topk"}
