"""Round-62: table_digest (order-invariant modular md5 checksum) and
the catalog-uniqueness AST guard (duplicate top-level defs / QUERIES
keys shadow silently — a collision once unregistered a query)."""
import ast
import hashlib
from collections import Counter

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES


def _table(res):
    if isinstance(res, pa.Table):
        return res
    batches = list(res.iter_batches(batch_size=None,
                                    batch_format="pyarrow"))
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches, promote_options="default")


class TestCatalogUnique:
    """Python silently lets a later ``def q_x`` / dict key shadow an
    earlier one — the whole catalog lives in one module, so a name
    reuse UNREGISTERS the older query with zero warnings. Parse the
    AST and refuse duplicates."""

    def test_no_duplicate_defs_or_keys(self):
        import raybeats.queries as qmod
        src = open(qmod.__file__.rstrip("c")).read()
        tree = ast.parse(src)
        names: Counter = Counter()
        for node in tree.body:
            if isinstance(node, ast.FunctionDef):
                names["def " + node.name] += 1
            elif isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        names[t.id] += 1
        dups = {n: c for n, c in names.items() if c > 1}
        assert not dups, f"shadowed top-level names: {dups}"
        for node in ast.walk(tree):
            if isinstance(node, ast.Assign) and len(node.targets) == 1 \
                    and isinstance(node.targets[0], ast.Name) \
                    and node.targets[0].id == "QUERIES":
                keys = [k.value for k in node.value.keys]
                kd = {k: c for k, c in Counter(keys).items() if c > 1}
                assert not kd, f"duplicate QUERIES keys: {kd}"
                assert len(keys) == len(QUERIES)


class TestTableDigest:
    def test_md5_number_lower_mirror(self):
        for s in ["abc", "", "héllo|x", "1|the quick brown fox"]:
            ours = int.from_bytes(
                hashlib.md5(s.encode()).digest()[8:16], "little")
            theirs = duckdb.sql(
                "SELECT CAST(md5_number_lower(?) AS HUGEINT)",
                params=[s]).fetchone()[0]
            assert ours == theirs

    def test_order_invariance_and_null(self, ray_session, tmp_path):
        rows = [(1, "aa", "s1"), (2, "bb", "s1"), (3, None, "s1"),
                (4, "cc", "s2")]
        for perm, sub in [((0, 1, 2, 3), "fwd"), ((2, 0, 3, 1), "rev")]:
            d = tmp_path / sub
            d.mkdir()
            rs = [rows[i] for i in perm]
            pq.write_table(pa.table({
                "doc_id": pa.array([r[0] for r in rs], pa.int64()),
                "text": pa.array([r[1] for r in rs], pa.string()),
                "lang": pa.array(["en"] * 4, pa.string()),
                "source": pa.array([r[2] for r in rs], pa.string()),
                "n_chars": pa.array([0] * 4, pa.int64())}),
                d / "documents.parquet")
        a = _table(QUERIES["table_digest"][0](
            str(tmp_path / "fwd"))).sort_by("source")
        b = _table(QUERIES["table_digest"][0](
            str(tmp_path / "rev"))).sort_by("source")
        assert a.equals(b)
        assert a.column("n_rows").to_pylist() == [3, 1]  # null counts
        exp = sum(int.from_bytes(hashlib.md5(
            f"{i}|{t}".encode()).digest()[8:16], "little")
            for i, t, s in rows if s == "s1" and t is not None) % (1 << 63)
        assert a.column("digest").to_pylist()[0] == exp

    def test_detects_single_row_change(self, ray_session, tmp_path):
        for sub, txt in [("a", "hello"), ("b", "hellp")]:
            d = tmp_path / sub
            d.mkdir()
            pq.write_table(pa.table({
                "doc_id": pa.array([1], pa.int64()),
                "text": pa.array([txt], pa.string()),
                "lang": pa.array(["en"], pa.string()),
                "source": pa.array(["s"], pa.string()),
                "n_chars": pa.array([5], pa.int64())}),
                d / "documents.parquet")
        a = _table(QUERIES["table_digest"][0](str(tmp_path / "a")))
        b = _table(QUERIES["table_digest"][0](str(tmp_path / "b")))
        assert a.column("digest").to_pylist() != \
            b.column("digest").to_pylist()
