from .incremental import IncrementalIndexer  # noqa: F401
