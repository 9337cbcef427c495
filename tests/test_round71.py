"""Round-71 operators: order_reconciliation (header-vs-lines billing
audit) and out_of_order_audit (watermark lateness via distributed
prefix-max)."""
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


def _orders(tmp_path, rows):
    """rows: (o_orderkey, o_orderstatus, o_totalprice)."""
    pq.write_table(pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderstatus": pa.array([r[1] for r in rows], pa.string()),
        "o_totalprice": pa.array([r[2] for r in rows], pa.float64())}),
        tmp_path / "orders.parquet")


def _lineitem(tmp_path, rows):
    """rows: (l_orderkey, l_extendedprice, l_discount, l_tax)."""
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_extendedprice": pa.array([r[1] for r in rows],
                                    pa.float64()),
        "l_discount": pa.array([r[2] for r in rows], pa.float64()),
        "l_tax": pa.array([r[3] for r in rows], pa.float64())}),
        tmp_path / "lineitem.parquet")


def _events(tmp_path, rows):
    """rows: (event_id, ts_us_or_None, event_type)."""
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string())}),
        tmp_path / "events.parquet")


class TestOrderReconciliation:
    def test_hand_values(self, ray_session, tmp_path):
        _orders(tmp_path, [(1, "O", 10.00), (2, "O", 20.00),
                           (3, "F", 7.00)])
        _lineitem(tmp_path, [
            # order 1: 500 + 500 cents == header 1000 — clean
            (1, 5.00, 0.0, 0.0), (1, 5.00, 0.0, 0.0),
            # order 2: 10*0.9*1.1 = 9.90 → 990 vs 2000 → |diff| 1010
            (2, 10.00, 0.1, 0.1),
            # orphan line (no order row): ignored by the LEFT JOIN
            (99, 1.00, 0.0, 0.0)])
        out = _table(QUERIES["order_reconciliation"][0](str(tmp_path)))
        got = {s: (n, m, sd, mx) for s, n, m, sd, mx in zip(
            out.column("o_orderstatus").to_pylist(),
            out.column("n_orders").to_pylist(),
            out.column("n_mismatch").to_pylist(),
            out.column("sum_abs_diff").to_pylist(),
            out.column("max_abs_diff").to_pylist())}
        # order 3 has NO lines: line total 0 vs 700 → mismatch 700
        assert got == {"O": (2, 1, 1010, 1010), "F": (1, 1, 700, 700)}

    def test_all_clean(self, ray_session, tmp_path):
        _orders(tmp_path, [(1, "O", 2.50)])
        _lineitem(tmp_path, [(1, 2.50, 0.0, 0.0)])
        out = _table(QUERIES["order_reconciliation"][0](str(tmp_path)))
        assert out.column("n_mismatch").to_pylist() == [0]
        assert out.column("sum_abs_diff").to_pylist() == [0]
        assert out.column("max_abs_diff").to_pylist() == [0]


class TestOutOfOrderAudit:
    def test_hand_values(self, ray_session, tmp_path):
        _events(tmp_path, [
            (1, 100, "A"),
            (2, 50, "A"),    # late by 50 vs running max 100
            (3, 200, "B"),
            (4, 200, "B"),   # equal to running max → NOT late
            (5, 120, "A"),   # late by 80 vs running max 200
        ])
        out = _table(QUERIES["out_of_order_audit"][0](str(tmp_path)))
        got = {t: (n, nl, ml) for t, n, nl, ml in zip(
            out.column("event_type").to_pylist(),
            out.column("n").to_pylist(),
            out.column("n_late").to_pylist(),
            out.column("max_late_us").to_pylist())}
        assert got == {"A": (3, 2, 80), "B": (2, 0, None)}

    def test_arrival_order_is_event_id_not_row_order(self, ray_session,
                                                     tmp_path):
        # written newest-arrival first; audit must order by event_id
        _events(tmp_path, [(2, 10, "A"), (1, 99, "A")])
        out = _table(QUERIES["out_of_order_audit"][0](str(tmp_path)))
        assert out.column("n_late").to_pylist() == [1]
        assert out.column("max_late_us").to_pylist() == [89]

    def test_monotone_stream_has_no_late(self, ray_session, tmp_path):
        _events(tmp_path, [(i, i * 10, "A") for i in range(1, 30)])
        out = _table(QUERIES["out_of_order_audit"][0](str(tmp_path)))
        assert out.column("n_late").to_pylist() == [0]
        assert out.column("max_late_us").to_pylist() == [None]
