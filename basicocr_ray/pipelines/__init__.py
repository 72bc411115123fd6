"""End-to-end pipelines (flagship extraction job, wide ops, driver queries)."""
