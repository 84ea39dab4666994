"""Ray Data execution-context defaults for this engine.

Mirrors the reference's partition-size policy (10-64 MB partitions,
``kgdata/spark/extended_rdd.py:192-210``) with Ray-native knobs: block
size on the DataContext, order preservation off for throughput.
"""

from __future__ import annotations

from ray.data import DataContext
from ray.data.context import ShuffleStrategy

MiB = 1024 * 1024


def configure(
    *,
    target_max_block_size: int = 64 * MiB,
    preserve_order: bool = False,
    quiet: bool = True,
    hash_shuffle: bool = False,
) -> DataContext:
    """Apply engine-wide DataContext defaults; returns the context.

    Idempotent; safe to call from tests, bench.py and pipelines alike.
    ``hash_shuffle=True`` routes groupby/aggregate through the
    hash-shuffle operator (no global sort per shuffle) — worth
    enabling on clusters with plenty of CPU headroom, but its
    aggregator-actor scheduling can deadlock tiny local clusters in
    Ray 2.49, so the default stays on the sort-based shuffle.
    """
    ctx = DataContext.get_current()
    ctx.target_max_block_size = target_max_block_size
    ctx.execution_options.preserve_order = preserve_order
    # Joins/hash-repartitions wait this long for aggregator actors to
    # come up before proceeding; the library default (300 s) adds
    # multi-second latency to every join op — 1 s is ample locally.
    ctx.min_hash_shuffle_aggregator_wait_time_in_s = 1
    # Size read splits to the cluster instead of the library default of
    # 200 blocks: hundreds of tiny blocks turn the driver's task loop
    # into the serial bottleneck (measured ~20% CPU utilization on a
    # 32-CPU pipeline at the default).
    import ray

    if ray.is_initialized():
        ncpu_ = int(ray.cluster_resources().get("CPU", 8))
        ctx.read_op_min_num_blocks = max(8, 2 * ncpu_)
    if hash_shuffle:
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        # Size shuffle parallelism to the actual cluster: the library
        # default (200 partitions / 64 aggregator actors / 300 s
        # aggregator wait) assumes a large multi-node cluster and
        # deadlocks a small local one.
        import ray

        if ray.is_initialized():
            ncpu = int(ray.cluster_resources().get("CPU", 8))
        else:
            ncpu = 8
        ctx.default_hash_shuffle_parallelism = max(2, 2 * ncpu)
        ctx.max_hash_shuffle_aggregators = max(2, ncpu // 2)
        if ncpu <= 16:
            # small clusters: keep aggregator CPU reservations low so
            # shuffle aggregators co-schedule with actor-pool stages
            # instead of deadlocking the pipeline. (Covers both scaling
            # levels, 4 and 16, with an identical configuration; at 32
            # CPUs the adaptive default schedules joins better.)
            ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.1
    if quiet:
        ctx.enable_progress_bars = False
        try:
            ctx.execution_options.verbose_progress = False
        except AttributeError:
            pass
    return ctx
