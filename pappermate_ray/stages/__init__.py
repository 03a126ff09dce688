"""Ray Data stages: batch transforms (stateless fns) and actor-pool classes.

Each stage is a ``map_batches``-compatible callable over Arrow tables
(``batch_format="pyarrow"``), soft-failing per row into status/error columns
(SafeProcessor semantics, reference services/safe_table_processor.py:17-30).
"""
