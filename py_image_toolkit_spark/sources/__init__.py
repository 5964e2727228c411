"""Sources & sinks: the snapshot-versioned table layer (Iceberg-style
commit/resume semantics with a plain-parquet fallback backend)."""
