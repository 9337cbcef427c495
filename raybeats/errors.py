"""Engine error types."""


class RaybeatsError(Exception):
    """Base class for engine errors."""


class ConfigError(RaybeatsError):
    """Invalid pipeline / processor configuration."""


class DissectError(RaybeatsError):
    """Tokenizer compile error (invalid dissect pattern)."""


class DissectParseError(RaybeatsError):
    """Per-string dissect parse failure (row-mode API only; the vectorized
    stage reports failures via a flags column instead of raising)."""
