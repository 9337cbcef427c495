"""raybeats — a Ray-Data-native parse → enrich → route → aggregate engine.

A brand-new engine with the data-processing capabilities of Elastic Beats'
shipper pipeline (reference: /root/reference, studied for behavior only),
re-expressed Ray-Data-first: vectorized Arrow batch transforms via
``Dataset.map_batches``, actor pools for stateful stages, selector-based
multi-sink routing, and a registrar-style per-partition checkpoint manifest.
"""

__version__ = "0.1.0"
