"""Round-48 operator: lang_confusion (predicted-vs-labeled language
confusion matrix). Value assertions: hand-built texts land in known
cells (including the empty-text 'und' row and a deliberate
mislabel), and the sf corpus matrix is diagonal-dominant for 'en'.
"""
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES


def _docs(tmp_path, rows):
    """rows: (doc_id, text, lang)."""
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")


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


class TestLangConfusion:
    def test_hand_cells(self, ray_session, tmp_path):
        rows = [
            (1, "the cat and the dog of it", "en"),   # en → en
            (2, "el perro la casa de que y", "es"),   # es → es
            (3, "the and of is it", "es"),            # mislabel: es→en
            (4, "", "en"),                            # empty → und
            (5, "xyzzy qwfp", "en")]                  # no stopword → und
        _docs(tmp_path, rows)
        got = _table(QUERIES["lang_confusion"][0](str(tmp_path)))
        r = {(x["lang"], x["lang_pred"]): x["n"]
             for x in got.to_pylist()}
        assert r == {("en", "en"): 1, ("es", "es"): 1,
                     ("es", "en"): 1, ("en", "und"): 2}

    def test_hand_oracle_parity(self, ray_session, tmp_path):
        rows = [(i, t, lg) for i, (t, lg) in enumerate([
            ("the and of a to", "en"), ("el la de que y", "es"),
            ("der die und das", "de"), ("le la de et les", "fr"),
            ("no stop words here really", "en"), ("", "und")])]
        _docs(tmp_path, rows)
        got = _table(QUERIES["lang_confusion"][0](str(tmp_path)))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{tmp_path}/documents.parquet'")
        want = con.execute(QUERIES["lang_confusion"][1]).arrow()
        assert _sorted_rows(got) == _sorted_rows(want)

    def test_sf_diagonal_dominant(self, ray_session):
        got = _table(QUERIES["lang_confusion"][0](
            "/root/testdata/sf0.001"))
        cells = {(x["lang"], x["lang_pred"]): x["n"]
                 for x in got.to_pylist()}
        en_total = sum(n for (lg, _), n in cells.items()
                       if lg == "en")
        assert cells.get(("en", "en"), 0) > en_total / 2
