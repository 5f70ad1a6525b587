"""Pipeline layer: job registry, fan-out, and object-store sinks
mirroring the reference's dataflow semantics (SURVEY.md §2.1, §2.9)."""
