"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:  # import-safe from any CWD
    sys.path.insert(0, _REPO)

import raybeats  # noqa: E402

# Ray workers may not have the repo on their sys.path (the driver controls
# its own CWD); serialize the engine by value so stages are self-contained
raybeats.register_for_pickle_by_value()

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship parse→enrich→route pipeline over sf0.001-derived
    transcripts; returns the routed Dataset."""
    from raybeats.queries import q_routed_rows
    return q_routed_rows(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    from raybeats.queries import QUERIES
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from raybeats.queries import QUERIES
    return {name: sql for name, (_fn, sql) in QUERIES.items()
            if sql is not None}
