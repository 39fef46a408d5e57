"""Custom stateful streaming operators via ``applyInPandasWithState``
(the escape hatch for state machines Spark's built-in windowed
aggregations can't express — SURVEY §2.9 extension surface).

``running_balances`` is the domain's canonical stateful op: fold the
per-(address, unit) net flows of each micro-batch into a persistent
balance — the live wallet-balance view of the chain. State lives in the
checkpointed state store (RocksDB on a real cluster), keyed by group;
each trigger emits the updated balances only (changelog semantics,
MERGE-ready for a serving store; operator output mode "append" — every
emitted row is final for its trigger).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

BALANCE_SCHEMA = T.StructType(
    [
        T.StructField("address", T.StringType()),
        T.StructField("unit", T.StringType()),
        T.StructField("balance", T.LongType()),
        T.StructField("n_changes", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("balance", T.LongType()),
        T.StructField("n_changes", T.LongType()),
    ]
)


def _exact_value_sum(values) -> int:
    """Exact integer sum of the batch's value column.

    Arrow→pandas renders an int64 column containing NULLs as float64
    (NaN for the NULLs): float64 .sum() would silently count NULL
    flows as 0 AND round above 2^53 lovelace — below Cardano's total
    supply, so a real balance could drift. NULLs are a data bug —
    fail loudly — and the sum runs in int64.
    """
    if values.isna().any():
        raise ValueError(
            "NULL flow value in stateful balance input — upstream "
            "netflow rows must be non-null"
        )
    return int(values.astype("int64").sum())


def _update_balance(key, pdfs: Iterator, state: GroupState) -> Iterable:
    """Fold this batch's flow values into the per-(address, unit)
    balance. Arrow-batched: pdfs iterates pandas frames for the group.
    Integer arithmetic — deterministic and replay-idempotent given
    exactly-once input."""
    import pandas as pd

    delta = 0
    n = 0
    for pdf in pdfs:
        delta += _exact_value_sum(pdf["value"])
        n += len(pdf)
    if state.exists:
        balance, n_changes = state.get
    else:
        balance, n_changes = 0, 0
    balance += delta
    n_changes += n
    state.update((balance, n_changes))
    yield pd.DataFrame(
        [{"address": key[0], "unit": key[1], "balance": balance,
          "n_changes": n_changes}]
    )


def running_balances(flows: DataFrame) -> DataFrame:
    """flows: streaming (address, unit, value) net-flow rows →
    changelog stream of updated (address, unit, balance, n_changes).

    Scale: state is partitioned by the group key across the cluster's
    state stores; each trigger touches only groups present in the
    batch. Balance is LongType here — swap to quanta-of-Decimal for
    mainnet supplies.
    """
    return flows.groupBy("address", "unit").applyInPandasWithState(
        _update_balance,
        outputStructType=BALANCE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas twin (Spark 4 "Arbitrary Stateful
# Processing v2"): the same balance fold on the successor API. v2 is
# where new stateful work should land — typed per-state variables
# (value/list/map) instead of one packed tuple, state TTL, timers, and
# initial-state bootstrap, all backed by the same keyed state store
# (RocksDB at scale). The legacy applyInPandasWithState form above is
# kept as the compatibility surface; both are covered by the same
# batch-aggregate parity test.
# ---------------------------------------------------------------------------
try:  # pragma: no cover - import guard exercised at module load
    # transformWithState needs Spark >= 4.0 AND google.protobuf (the
    # state-server wire protocol); protobuf ships with standard Spark
    # deployments but not with every minimal container image.
    import google.protobuf  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    HAS_TWS = True
except ImportError:  # Spark < 4.0, or no protobuf in the environment
    StatefulProcessor = object  # type: ignore[assignment,misc]
    HAS_TWS = False


def running_balances_v2(flows: DataFrame) -> DataFrame:
    """``running_balances`` on ``transformWithStateInPandas`` — same
    input contract (streaming (address, unit, value)), same changelog
    output. Requires Spark >= 4.0 (``HAS_TWS``).

    The processor class is defined INSIDE this function on purpose:
    cloudpickle then serializes it by value, so the TWS driver worker
    (a separate Python process that unpickles the processor to discover
    state schemas) does not need this package on its PYTHONPATH — a
    module-level class pickles by reference and crashes that worker
    with ModuleNotFoundError on any cluster where the package is not
    installed into the worker environment.
    """
    if not HAS_TWS:
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark >= 4.0 and "
            "google.protobuf; use running_balances "
            "(applyInPandasWithState) instead"
        )

    class BalanceProcessor(StatefulProcessor):
        """Per-(address, unit) running balance: state is one ValueState
        row (balance, n_changes); each trigger folds the group's Arrow
        batches into it and emits the updated row — identical changelog
        semantics to ``running_balances``."""

        def init(self, handle: "StatefulProcessorHandle") -> None:
            self._state = handle.getValueState(
                "balance", "balance LONG, n_changes LONG"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            delta = 0
            n = 0
            for pdf in rows:
                delta += _exact_value_sum(pdf["value"])
                n += len(pdf)
            if self._state.exists():
                balance, n_changes = self._state.get()
            else:
                balance, n_changes = 0, 0
            balance += delta
            n_changes += n
            self._state.update((balance, n_changes))
            yield pd.DataFrame(
                [
                    {
                        "address": key[0],
                        "unit": key[1],
                        "balance": balance,
                        "n_changes": n_changes,
                    }
                ]
            )

        def close(self) -> None:
            pass

    return flows.groupBy("address", "unit").transformWithStateInPandas(
        statefulProcessor=BalanceProcessor(),
        outputStructType=BALANCE_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
