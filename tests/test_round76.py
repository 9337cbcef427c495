"""Round-76: fast whole-catalog oracle sanity — every SQL oracle must
at least EXPLAIN against the registered views. The full gate proves
value equality but costs ~25 min; this catches SQL typos / schema
drift in seconds on every test run."""
import duckdb
import pytest

from raybeats.queries import QUERIES

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"'{SF}/{t}.parquet'")
    return c


def test_every_oracle_explains(con):
    bad = []
    for name, (_fn, sql) in QUERIES.items():
        if sql is None:
            continue
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as e:  # collect all, report together
            bad.append((name, str(e).splitlines()[0]))
    assert not bad, bad


def test_catalog_counts_match_docs():
    """COVERAGE.md advertises the catalog totals — keep them honest."""
    import re
    n_total = len(QUERIES)
    n_oracled = sum(1 for _f, s in QUERIES.values() if s is not None)
    text = open("COVERAGE.md").read()
    m = re.search(r"Catalog totals: \*\*(\d+) queries / (\d+) exact "
                  r"DuckDB oracles / (\d+)\s*\nrows-only", text)
    assert m, "totals line missing from COVERAGE.md"
    assert (int(m.group(1)), int(m.group(2)), int(m.group(3))) == \
        (n_total, n_oracled, n_total - n_oracled), (
        n_total, n_oracled, n_total - n_oracled)
