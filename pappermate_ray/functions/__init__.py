"""Pure, deterministic scalar functions (no Ray, no I/O, no wall-clock).

These are the per-row semantics; Ray stages in ``pappermate_ray.stages``
vectorize / batch them. Every function cites the reference behavior it
reimplements (SURVEY.md §2.2/§2.8).
"""
