"""End-to-end pipelines: the resumable encode job, partitioned outputs."""
