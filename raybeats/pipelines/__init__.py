from .flagship import flagship_config, flagship_pipeline  # noqa: F401
