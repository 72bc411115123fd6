"""Per-partition lineage, manifests, resume."""
