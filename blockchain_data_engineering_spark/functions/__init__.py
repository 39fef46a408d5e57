"""Scalar expression library — SURVEY.md §2.7 (F1-F12)."""

from blockchain_data_engineering_spark.functions.scalar import (  # noqa: F401
    abs_value,
    asset_display_name,
    decimal_scaled,
    deterministic_id,
    hex_decode_utf8,
    lovelace_to_ada,
    normalize_unit,
    short_label,
    slot_to_timestamp,
    unit_of,
)
