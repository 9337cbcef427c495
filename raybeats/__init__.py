"""raybeats — a Ray-Data-native parse → enrich → route → aggregate engine.

A brand-new engine with the data-processing capabilities of Elastic Beats'
shipper pipeline (reference: /root/reference, studied for behavior only),
re-expressed Ray-Data-first: vectorized Arrow batch transforms via
``Dataset.map_batches``, actor pools for stateful stages, selector-based
multi-sink routing, and a registrar-style per-partition checkpoint manifest.
"""

__version__ = "0.1.0"


def register_for_pickle_by_value() -> None:
    """Make every ``raybeats`` module serialize BY VALUE in Ray pickles.

    Worker processes resolve pickled stage classes by importing their
    module; that only works when the driver's CWD (or PYTHONPATH) makes
    ``raybeats`` importable. By-value registration embeds the code in the
    pickle instead, so the engine runs regardless of where the driver was
    launched from (e.g. a harness importing ``__ray_entry__`` by path).
    Idempotent; safe to call before or after ``ray.init``.
    """
    import sys

    # import the module tree first so everything is registered
    from . import (conditions, dissect, enrich, fixtures, fmtstr, model,  # noqa: F401
                   pipeline, queries, router, streaming, transcripts, util)
    from . import processors, sources, state, textops  # noqa: F401
    from .pipelines import flagship  # noqa: F401

    try:
        from ray import cloudpickle as cp
    except ImportError:  # pragma: no cover
        import cloudpickle as cp
    for name, mod in list(sys.modules.items()):
        if name == "raybeats" or name.startswith("raybeats."):
            if mod is not None:
                try:
                    cp.register_pickle_by_value(mod)
                except Exception:
                    pass
