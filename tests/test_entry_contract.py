"""Driver-contract consistency checks (no Spark execution needed)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as E  # noqa: E402


def test_registry_shapes():
    qs = E.queries()
    sqls = E.oracle_sql()
    assert len(qs) >= 30
    assert set(sqls) <= set(qs)
    # most queries must carry a DuckDB oracle; rows-only is the exception
    assert len(sqls) >= 0.75 * len(qs)
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in sqls.items():
        assert "SELECT" in sql.upper(), name


def test_rows_only_queries_are_the_documented_ones():
    qs, sqls = E.queries(), E.oracle_sql()
    rows_only = set(qs) - set(sqls)
    assert rows_only == {
        "q29_winnow_fingerprint",      # per-char rolling hash: pytest golden
        "q32_kg_pipeline_predicates",  # transcripts aren't DuckDB views
    }
