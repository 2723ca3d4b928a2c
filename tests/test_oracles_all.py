"""Driver-coverage insurance: the ALL-queries oracle gate, pytest-visible.

The per-round driver samples a subset of the ``queries()`` surface; a
regression in a never-sampled query would otherwise only surface in manual
``scripts/check_oracles.py`` runs.  This module parametrizes one test per
queries() entry and hash-compares Spark vs DuckDB at sf0.001 on every
``python -m pytest tests/`` run (small enough to stay in suite budget);
set ``SPARK_GRAFT_FULL_ORACLES=1`` to ALSO gate at sf0.01 — the exact
scale the driver checks (that's what CI should run before a round lands).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import __spark_entry__ as entry_mod
from oracle_compare import compare_one, register_views

QUERY_NAMES = sorted(entry_mod.queries())

SF_DIRS = ["/root/testdata/sf0.001"]
if os.environ.get("SPARK_GRAFT_FULL_ORACLES"):
    SF_DIRS.append("/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def duck_cons():
    import duckdb

    cons = {}
    for sf_dir in SF_DIRS:
        con = duckdb.connect(
            config={"temp_directory": "/tmp/duckdb_spill"}
        )
        register_views(con, entry_mod.TABLES, sf_dir)
        cons[sf_dir] = con
    yield cons
    for con in cons.values():
        con.close()


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck_cons, name, sf_dir):
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} not generated")
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    r = compare_one(spark, duck_cons[sf_dir], fn, sql, sf_dir)
    if r["rows_only"]:
        # documented rows-only queries only assert executability
        assert r["spark_rows"] >= 0
        return
    assert r["rows_match"], (
        f"{name}: spark={r['spark_rows']} oracle={r['oracle_rows']}"
    )
    assert r["schema_match"], (
        f"{name}: cols_s={r['cols_s']} cols_d={r['cols_d']}"
    )
    if not r["values_match"]:
        s, o = r["s"], r["o"]
        diff = (s != o).any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch\nspark:\n{s[diff].head(3)}\n"
            f"oracle:\n{o[diff].head(3)}"
        )
