"""End-to-end pipelines: transcript dedup (flagship), evaluation, generic
analytic operators, training-data ops (dedup/ANN/text-analysis/multimodal)."""
