"""The Arrow-batched Python escape hatch (SURVEY §2.10).

The reference ran ALL its transform logic in row-at-a-time pickled
UDFs (U1-U5); this engine rewrote every one as native expressions. But
a real engine still needs the escape hatch for semantics Catalyst
can't express (custom per-group models, third-party libs). The
sanctioned shape is ``applyInPandas``/``mapInPandas`` — whole Arrow
batches per group/partition, never per-row pickling.

``grouped_demean_scaled`` is the reference example: a per-group pandas
kernel whose output is integer-exact (value·n − Σvalues per group), so
even the Python path stays oracle-verifiable bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_demean_scaled(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    out_col: str = "demeaned_scaled",
) -> DataFrame:
    """Per group: ``out = value·n − Σ(value)`` (the demeaned value
    scaled by the group size — all-integer, so exactly reproducible).

    Implemented with applyInPandas to exercise the Arrow group-map
    path; semantically equivalent to a window expression (which is how
    the oracle verifies it).
    """
    import pandas as pd

    keys = list(group_cols)
    # out = value·n − Σ can exceed the input type's range (an int32
    # value times a large group), so integral inputs declare a LONG
    # output column; fractional inputs keep their own type
    from pyspark.sql import types as T

    in_type = df.schema[value_col].dataType
    out_type = (
        T.LongType()
        if isinstance(in_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType))
        else in_type
    )
    schema = df.select(
        *keys,
        F.col(value_col),
        F.col(value_col).cast(out_type).alias(out_col),
    ).schema

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        v = pdf[value_col]
        # widen BEFORE multiplying: Arrow hands the kernel the input's
        # own dtype, and numpy keeps int32 for int32-array · python-int
        # — v·n would wrap in-kernel and the LONG output column would
        # faithfully store the wrapped garbage
        if v.dtype.kind in ("i", "u"):
            v = v.astype("int64")
        pdf = pdf.copy()
        pdf[out_col] = v * len(v) - v.sum()
        return pdf

    return df.select(*keys, value_col).groupBy(*keys).applyInPandas(kernel, schema)
