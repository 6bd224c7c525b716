"""Run-state: stage manifests, lineage, counters, idempotent resume."""
