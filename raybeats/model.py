"""Data model: transcript schema and reserved meta columns.

The engine's unit of data is a row of an Arrow table with flat, dotted
column names (the Ray-native re-expression of the reference's nested
``beat.Event`` MapStr document, ``libbeat/beat/event.go:35-41``). The
reference's out-of-band ``Meta`` map becomes a reserved ``meta_`` column
group carried through the pipeline and stripped by sinks; ``@timestamp``
becomes the ``ts`` timestamp column; per-row parse flags mirror
``log.flags``.
"""

from __future__ import annotations

import pyarrow as pa

# Input schema (BASELINE.json input_hint)
TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

# Reserved meta/side-band columns (analog of beat.Event.Meta)
META_ID = "meta_id"                    # Meta._id
META_DEAD_LETTER = "meta_dead_letter"  # Meta.deadlettered
FLAGS = "log_flags"                    # log.flags (comma-joined string set)
SINK = "sink"                          # router output (selector result)
INDEX = "index"                        # per-sink formatted index/topic name

META_COLUMNS = (META_ID, META_DEAD_LETTER, FLAGS, SINK, INDEX)

FLAG_DISSECT_ERROR = "dissect_parsing_error"


def strip_meta(tbl: pa.Table) -> pa.Table:
    """Remove meta columns before handing rows to a sink (outputs may
    consume Meta but it is not part of the document body)."""
    drop = [c for c in tbl.column_names if c in META_COLUMNS]
    return tbl.drop_columns(drop) if drop else tbl
