"""Dataset-level stages: ordered slicing, aggregation, encoding pipelines."""
