from . import analysis, dedup, knn, multimodal  # noqa: F401
