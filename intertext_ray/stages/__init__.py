import os


def maybe_split(ds, n: int):
    """Block-granularity guard before a wide groupby / actor pool: slice into
    >= n blocks (no data movement) so the downstream stage parallelizes even
    when upstream emitted a handful of large blocks.  Skippable via
    ITX_NO_SPLIT=1 when ``DataContext.target_max_block_size`` is tuned small
    enough that upstream block counts are already adequate."""
    if os.environ.get("ITX_NO_SPLIT"):
        return ds
    return ds.repartition(n)
