"""Round-70 operators: ohlc_weekly (positional open/high/low/close
bars per event-type week) and chat_format_check (SFT chat-template
lint per conversation)."""
import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from raybeats.queries import QUERIES

DAY_US = 86_400 * 1_000_000
# Monday 2024-01-01 00:00:00 UTC in epoch microseconds
MON = int(datetime.datetime(2024, 1, 1,
                            tzinfo=datetime.timezone.utc).timestamp()
          ) * 1_000_000


def _table(res):
    if isinstance(res, pa.Table):
        return res
    batches = list(res.iter_batches(batch_size=None,
                                    batch_format="pyarrow"))
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches, promote_options="default")


def _events(tmp_path, rows):
    """rows: (event_id, user_id, ts_us, event_type, value)."""
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())}),
        tmp_path / "events.parquet")


class TestOhlcWeekly:
    def test_hand_values(self, ray_session, tmp_path):
        rows = [
            # type A, week of MON: open 5, high 9, low 1, close 7
            (1, 1, MON + 0, "A", 5.0),
            (2, 1, MON + 1, "A", 9.0),
            (3, 1, MON + 2, "A", 1.0),
            (4, 1, MON + 3, "A", 7.0),
            # type A, following week: single bar
            (5, 1, MON + 7 * DAY_US, "A", 2.0),
            # type B same week as A's first — independent bar
            (6, 1, MON + 1, "B", 4.0),
        ]
        _events(tmp_path, rows)
        out = _table(QUERIES["ohlc_weekly"][0](str(tmp_path)))
        got = {(t, w): (o, h, lo, c, n) for t, w, o, h, lo, c, n in zip(
            out.column("event_type").to_pylist(),
            [int(x.timestamp() * 1e6) for x in
             out.column("week_start").to_pylist()],
            out.column("open_v").to_pylist(),
            out.column("high_v").to_pylist(),
            out.column("low_v").to_pylist(),
            out.column("close_v").to_pylist(),
            out.column("n").to_pylist())}
        assert got == {
            ("A", MON): (5.0, 9.0, 1.0, 7.0, 4),
            ("A", MON + 7 * DAY_US): (2.0, 2.0, 2.0, 2.0, 1),
            ("B", MON): (4.0, 4.0, 4.0, 4.0, 1)}

    def test_ts_tie_broken_by_event_id(self, ray_session, tmp_path):
        # two rows at the identical timestamp: event_id decides
        # which is open and which is close
        rows = [(7, 1, MON, "A", 3.0), (2, 1, MON, "A", 8.0)]
        _events(tmp_path, rows)
        out = _table(QUERIES["ohlc_weekly"][0](str(tmp_path)))
        assert out.column("open_v").to_pylist() == [8.0]
        assert out.column("close_v").to_pylist() == [3.0]

    def test_nan_null_excluded_and_empty_ok(self, ray_session,
                                            tmp_path):
        rows = [(1, 1, MON, "A", float("nan")),
                (2, 1, MON + 1, "A", None)]
        _events(tmp_path, rows)
        out = _table(QUERIES["ohlc_weekly"][0](str(tmp_path)))
        assert out.num_rows == 0

    def test_week_boundary_splits_bars(self, ray_session, tmp_path):
        # Sunday 23:59:59.999999 vs Monday 00:00:00 land in
        # different bars
        rows = [(1, 1, MON + 7 * DAY_US - 1, "A", 1.0),
                (2, 1, MON + 7 * DAY_US, "A", 2.0)]
        _events(tmp_path, rows)
        out = _table(QUERIES["ohlc_weekly"][0](str(tmp_path)))
        assert out.num_rows == 2


class TestChatFormatCheck:
    # transcripts role mapping: signup→system, click/view→user,
    # purchase→assistant, error→tool; turn order = event_id
    def _run(self, tmp_path, rows):
        _events(tmp_path, rows)
        out = _table(QUERIES["chat_format_check"][0](str(tmp_path)))
        return {c: (nt, bs, ns, no, ok) for c, nt, bs, ns, no, ok in zip(
            out.column("conv_id").to_pylist(),
            out.column("n_turns").to_pylist(),
            out.column("bad_start").to_pylist(),
            out.column("n_consec_same").to_pylist(),
            out.column("n_orphan_tool").to_pylist(),
            out.column("ok").to_pylist())}

    def test_hand_values(self, ray_session, tmp_path):
        rows = [
            # user 1: user → assistant → tool — clean
            (1, 1, MON, "click", 1.0),
            (2, 1, MON + 1, "purchase", 1.0),
            (3, 1, MON + 2, "error", 1.0),
            # user 2: opens with assistant — bad start
            (10, 2, MON, "purchase", 1.0),
            # user 3: user, user — one consecutive-same-role pair
            (20, 3, MON, "view", 1.0),
            (21, 3, MON + 1, "click", 1.0),
            # user 4: system then tool — orphan tool turn
            (30, 4, MON, "signup", 1.0),
            (31, 4, MON + 1, "error", 1.0),
        ]
        got = self._run(tmp_path, rows)
        assert got == {
            "conv-00000001": (3, False, 0, 0, True),
            "conv-00000002": (1, True, 0, 0, False),
            "conv-00000003": (2, False, 1, 0, False),
            "conv-00000004": (2, False, 0, 1, False)}

    def test_turn_order_is_turn_idx_not_input_order(self, ray_session,
                                                    tmp_path):
        # written assistant-first, but turn_idx says user-first
        rows = [(5, 1, MON, "purchase", 1.0),
                (4, 1, MON + 1, "click", 1.0)]
        got = self._run(tmp_path, rows)
        assert got == {"conv-00000001": (2, False, 0, 0, True)}

    def test_leading_tool_turn_is_orphan(self, ray_session, tmp_path):
        rows = [(1, 1, MON, "error", 1.0),
                (2, 1, MON + 1, "purchase", 1.0)]
        got = self._run(tmp_path, rows)
        # tool opener: bad start AND an orphan tool turn
        assert got == {"conv-00000001": (2, True, 0, 1, False)}
