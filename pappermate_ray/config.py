"""Execution-context tuning for document workloads (memory-aware knobs).

One place for the `DataContext` settings the engine relies on, instead of
scattering them across entry points. Profiles:

- ``default``  — text/contract corpora: 128 MiB blocks, unordered
  execution, tensor-extension casting off (nested list columns must stay
  Arrow), quiet progress.
- ``wide_rows`` — multi-MB binary payloads (media, giant html): smaller
  target blocks so one block ≈ a handful of rows, keeping
  batch × concurrency inside a worker's heap; callers should ALSO lower
  ``batch_size`` on their map stages (the knob here only shapes blocks).

Entry points call ``tune_context()``; the library itself never touches
global state at import time.
"""

from __future__ import annotations


def tune_context(profile: str = "default"):
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.enable_tensor_extension_casting = False
    ctx.execution_options.preserve_order = False  # within-doc order is data, not execution order
    if profile == "default":
        ctx.target_max_block_size = 128 * 1024 * 1024
    elif profile == "wide_rows":
        # blocks of ~16 MiB so a 100 MB payload row forces a 1-row block
        # instead of ballooning a multi-row one
        ctx.target_max_block_size = 16 * 1024 * 1024
    else:
        raise ValueError(f"unknown profile: {profile}")
    return ctx
