"""Pipeline plans (stage orchestration, checkpoints, lineage)."""
