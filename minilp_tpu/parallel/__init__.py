"""Multi-chip scaling: device meshes, shardings, deterministic pricing reductions,
and the batched (data-parallel) scenario engine.  See SURVEY.md §3.3 / §6.8."""
