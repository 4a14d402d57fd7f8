"""Job plans: full/incremental index build, lineage, resume."""
