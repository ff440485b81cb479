"""Column-function library: the reference's value-normalization and
formatting helpers as Spark column expressions."""

from empujar_spark.functions.scalar import (
    sanitize_string,
    format_datetime,
    zero_date_to_null,
    rename_reserved,
    utf8_byte_length,
)

__all__ = [
    "sanitize_string",
    "format_datetime",
    "zero_date_to_null",
    "rename_reserved",
    "utf8_byte_length",
]
