"""Custom stateful streaming operator via applyInPandasWithState:
per-user running totals that survive across micro-batches — the shape
of any bespoke streaming aggregate Spark lacks natively (SURVEY.md
§2.3 UDF/stateful row)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, cents long"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user cumulative (count, sum(value)); emits the
    updated running total every micro-batch the user appears in.

    State accumulates integer CENTS (fixture values are 2-decimal
    doubles): an exact bigint sum is order- and batch-boundary-
    independent, so the emitted total is bit-identical however the
    stream is micro-batched — and matches a DECIMAL(12,2) SQL sum
    cast to double (one correctly-rounded division at emission).

    The update function is a self-contained closure (no package
    globals) so cloudpickle ships it by value to Python workers."""

    def update(key, pdfs, state):
        import pandas as pd

        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [cents / 100.0],
            }
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
