from .ingest_stream import ingest_stream  # noqa: F401
