"""Sources & sinks: synthetic fixtures, parquet IO, lineage manifests."""
