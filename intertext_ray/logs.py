"""Targeted suppression of one known-benign Ray Data log line.

Ray's streaming executor warns whenever an operator emits a RefBundle whose
schema differs from the previous bundle — including the case where the new
bundle is EMPTY and schema-less (``new schema: <nothing>``).  Schema-less
empty bundles are produced inside Ray itself whenever a map/filter task
outputs zero rows for a block or a sort/groupby creates more partitions
than distinct keys (repro + analysis in SCALING.md "empty-schema
RefBundle"), so the warning fires on correct pipelines and cannot be fixed
from user code: Ray only exempts empty *previous* schemas, not empty *new*
ones (``streaming_executor_state.py:783-797``).

``quiet_ray_data_noise()`` installs a logging filter that drops exactly
that message shape — a schema divergence where the NEW schema is empty.
Real divergences (two non-empty schemas) still log.
"""

from __future__ import annotations

import logging

_TARGET_LOGGER = "ray.data._internal.execution.streaming_executor_state"
_EMPTY_NEW_SCHEMA = "new schema: . This may lead to unexpected behavior."


class _EmptyBundleSchemaFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        msg = record.getMessage()
        return not (
            "RefBundle with a different schema" in msg
            and msg.rstrip().endswith(_EMPTY_NEW_SCHEMA)
        )


def quiet_ray_data_noise() -> None:
    """Idempempotently install the empty-new-schema filter."""
    lg = logging.getLogger(_TARGET_LOGGER)
    if not any(isinstance(f, _EmptyBundleSchemaFilter) for f in lg.filters):
        lg.addFilter(_EmptyBundleSchemaFilter())
