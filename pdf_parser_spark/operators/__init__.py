"""Spark operator stages: vectorized extraction, relational post-processing,
dedup/similarity/text-stats for training-data pipelines, checkpoint/resume."""
