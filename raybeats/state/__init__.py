from .manifest import CheckpointManifest  # noqa: F401
