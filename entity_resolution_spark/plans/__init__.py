"""Pipeline plans: end-to-end ER over pages, stage checkpointing, lineage."""
