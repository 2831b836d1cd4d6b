"""End-to-end pipelines and the step registry."""
