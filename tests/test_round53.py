"""Round-53 operator: pii_report (per-source PII audit). Value
assertions: hand-planted hits land in the right source rows with
staged counting (an IP inside an email is not double-counted), and
the report is consistent with pii_scrub's per-doc counts on the sf
corpus.
"""
import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES


def _docs(tmp_path, rows):
    """rows: (doc_id, text, source)."""
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")


def _table(res):
    if isinstance(res, pa.Table):
        return res
    return pa.concat_tables(res.iter_batches(batch_format="pyarrow"),
                            promote_options="default")


class TestPiiReport:
    def test_hand_counts(self, ray_session, tmp_path):
        rows = [
            # ids chosen % 7 != 0 so only the literal text counts
            (1, "mail me at a@b.com and c@d.org", "web"),
            (2, "ssn 123-45-6789 twice 987-65-4321", "web"),
            (3, "server at 10.1.2.3", "logs"),
            # staged: the IP-shaped tail of the email is consumed by
            # the email replacement, NOT double-counted as an IP
            (4, "x@10.1.2.3.co end", "logs"),
            (5, "clean text", "logs")]
        _docs(tmp_path, rows)
        got = _table(QUERIES["pii_report"][0](str(tmp_path)))
        r = {x["source"]: (x["n_email"], x["n_ssn"], x["n_ip"],
                           x["n_docs_hit"]) for x in got.to_pylist()}
        assert r == {"web": (2, 2, 0, 2), "logs": (1, 0, 1, 2)}

    def test_consistent_with_scrub(self, ray_session):
        sf = "/root/testdata/sf0.001"
        rep = _table(QUERIES["pii_report"][0](sf))
        scrub = _table(QUERIES["pii_scrub"][0](sf))
        assert sum(x["n_email"] for x in rep.to_pylist()) \
            == sum(x["n_email"] for x in scrub.to_pylist())
        assert sum(x["n_docs_hit"] for x in rep.to_pylist()) > 0
