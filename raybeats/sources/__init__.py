from .logfiles import read_log_lines, read_ndjson  # noqa: F401
