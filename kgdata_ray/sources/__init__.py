"""Sources: ndjson/text-line datasets with pre/post filters (the
reference's ``Dataset`` line-deser abstraction) and pruned parquet
readers."""
