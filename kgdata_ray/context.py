"""Ray Data execution-context defaults for this engine.

Mirrors the reference's partition-size policy (10-64 MB partitions,
``kgdata/spark/extended_rdd.py:192-210``) with Ray-native knobs: block
size on the DataContext, order preservation off for throughput.
"""

from __future__ import annotations

from ray.data import DataContext

MiB = 1024 * 1024


def configure(
    *,
    target_max_block_size: int = 64 * MiB,
    preserve_order: bool = False,
    quiet: bool = True,
) -> DataContext:
    """Apply engine-wide DataContext defaults; returns the context.

    Idempotent; safe to call from tests, bench.py and pipelines alike.
    """
    ctx = DataContext.get_current()
    ctx.target_max_block_size = target_max_block_size
    ctx.execution_options.preserve_order = preserve_order
    if quiet:
        ctx.enable_progress_bars = False
        try:
            ctx.execution_options.verbose_progress = False
        except AttributeError:
            pass
    return ctx
