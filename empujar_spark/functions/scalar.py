"""Scalar column functions replicating the reference's write-side value
normalization (lib/connections/redshift.js:71-104 sanitizeString,
snowflake.js:479-524 computeDataToBePushed) as JVM-side expressions —
the per-row JS loops become vectorized column ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_STRING_BYTES = 65535  # redshift.js:93-96

# redshift.js:63-69: reserved-word column renames
RESERVED_RENAMES = {
    "authorization": "authorization_",
    "tag": "tag_",
    "system": "system_",
}

ZERO_DATE_LITERALS = ("0000-00-00 00:00:00", "0000-00-00")  # redshift.js:98-104


def sanitize_string(col: Column, max_bytes: int = MAX_STRING_BYTES) -> Column:
    """redshift.js:71-104: strip NUL bytes, normalize zero-dates to NULL,
    truncate to ``max_bytes`` UTF-8 BYTES (not characters).

    Byte-aware truncation without a UDF: encode→binary slice→decode; the
    decode drops a trailing partial codepoint (replacement chars are then
    stripped) — same observable contract as the reference's byte loop.
    """
    cleaned = F.regexp_replace(col, "\x00", "")  # strip NUL bytes
    truncated = F.when(
        F.length(F.encode(cleaned, "UTF-8")) <= max_bytes, cleaned
    ).otherwise(
        F.regexp_replace(
            F.decode(
                F.substring(F.encode(cleaned, "UTF-8"), 1, max_bytes), "UTF-8"
            ),
            "�+$",
            "",
        )
    )
    return zero_date_to_null(truncated)


def zero_date_to_null(col: Column) -> Column:
    """MySQL zero-dates → SQL NULL (redshift.js:98-104)."""
    return F.when(col.isin(*ZERO_DATE_LITERALS), F.lit(None)).otherwise(col)


def format_datetime(col: Column) -> Column:
    """Date → 'yyyy-MM-dd HH:mm:ss' second-resolution string
    (redshift.js:248-251; test/connections/mysql.js:241)."""
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


def utf8_byte_length(col: Column) -> Column:
    """UTF-8 byte count (lib/utils.js:75-97) — drives byte-budget batch
    sizing in the reference; kept for API parity and size accounting."""
    return F.length(F.encode(col, "UTF-8"))


def rename_reserved(df: DataFrame) -> DataFrame:
    """Reserved-word column renames (redshift.js:63-69, 189-198)."""
    for old, new in RESERVED_RENAMES.items():
        if old in df.columns:
            df = df.withColumnRenamed(old, new)
    return df
