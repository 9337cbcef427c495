"""Round-39 operators: conv_token_budget (context-window gating) and
region_nation_rollup (two-level snowflake ROLLUP with GROUPING
bitmask). Value assertions beyond the gate: token-count conservation
against the corpus tokenizer, over-budget flagging, and rollup level
consistency (subtotals re-sum, grand total matches).
"""
import duckdb
import pyarrow as pa

from raybeats.queries import QUERIES


def _table(res):
    if isinstance(res, pa.Table):
        return res
    return pa.concat_tables(res.iter_batches(batch_format="pyarrow"),
                            promote_options="default")


def _sorted_rows(tb):
    cols = sorted(tb.column_names)
    return sorted(
        map(tuple, zip(*[tb.column(c).to_pylist() for c in cols])),
        key=lambda r: tuple((v is None, v) for v in r))


class TestConvTokenBudget:
    def test_conservation_and_flag(self, ray_session):
        sf = "/root/testdata/sf0.001"
        got = _table(QUERIES["conv_token_budget"][0](sf))
        rows = got.to_pylist()
        # token totals conserve against the shared tokenizer
        from raybeats.textops.analysis import flat_tokens
        from raybeats.transcripts import read_transcripts
        total = 0
        for b in read_transcripts(sf).iter_batches(
                batch_format="pyarrow"):
            _, toks, _ = flat_tokens(b.column("text"))
            total += len(toks)
        assert sum(r["n_tokens"] for r in rows) == total
        for r in rows:
            assert r["over_budget"] == (r["n_tokens"] > 4096)

    def test_oracle_parity_sf(self, ray_session):
        sf = "/root/testdata/sf0.001"
        got = _table(QUERIES["conv_token_budget"][0](sf))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf}/events.parquet'")
        want = con.execute(QUERIES["conv_token_budget"][1]).arrow()
        assert _sorted_rows(got) == _sorted_rows(want)


class TestRegionNationRollup:
    def test_levels_consistent(self, ray_session):
        sf = "/root/testdata/sf0.001"
        got = _table(QUERIES["region_nation_rollup"][0](sf))
        rows = got.to_pylist()
        full = [r for r in rows if r["grouping"] == 0]
        sub = {r["region"]: r for r in rows if r["grouping"] == 1}
        grand = [r for r in rows if r["grouping"] == 3]
        assert len(grand) == 1
        # per-region subtotals re-sum from the full tuples
        for reg, s in sub.items():
            cells = [r for r in full if r["region"] == reg]
            assert sum(r["n_customers"] for r in cells) \
                == s["n_customers"]
            assert sum(r["acctbal_cents"] for r in cells) \
                == s["acctbal_cents"]
        assert sum(r["n_customers"] for r in full) \
            == grand[0]["n_customers"]

    def test_oracle_parity_sf(self, ray_session):
        sf = "/root/testdata/sf0.001"
        got = _table(QUERIES["region_nation_rollup"][0](sf))
        con = duckdb.connect()
        for tb in ("customer", "nation", "region"):
            con.execute(f"CREATE VIEW {tb} AS SELECT * FROM "
                        f"'{sf}/{tb}.parquet'")
        want = con.execute(QUERIES["region_nation_rollup"][1]).arrow()
        assert _sorted_rows(got) == _sorted_rows(want)
