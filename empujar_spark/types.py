"""Type inference & promotion lattice.

The reference has no declared schemas: column types are inferred from
runtime values and promoted as data evolves (reference
lib/connections/mysql.js:416-433 ``getColumnDefinition``,
lib/connections/snowflake.js:703-724; promotion rules
mysql.js:409-414, 486-488, 336-358). This module reproduces that
observable lattice as pure Python over schemas — never per-row inside
Spark jobs.

The lattice (⊑ = "promotes to"):

    unknown ⊑ everything          (varchar(0) sentinel, mysql.js:35-38)
    long    ⊑ double              (int→float, mysql.js:412-414)
    varchar(n) ⊑ varchar(m>n) ⊑ text   (widening, mysql.js:409-411, 336-350)
    boolean/timestamp fixed points
    any incompatible pair ⊑ text  (safe sink; the reference would error —
                                   we choose the total lattice and document it)

Spark mapping: unknown→NullType (pending), boolean→BooleanType,
long→LongType, double→DoubleType, timestamp→TimestampType,
varchar/text→StringType (char_length kept as engine metadata, since Spark
strings are unbounded — the *observable* behavior preserved is the
promotion sequencing and show_columns metadata, not physical truncation).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass

from pyspark.sql import types as T

VARCHAR_DEFAULT_LENGTH = 255  # reference mysql.js:23-25 options.varCharLength

UNKNOWN = "unknown"
BOOLEAN = "boolean"
LONG = "long"
DOUBLE = "double"
TIMESTAMP = "timestamp"
VARCHAR = "varchar"
TEXT = "text"
# Engine extension beyond the reference's MySQL-shaped lattice: typed
# array columns (embedding vectors, token-id lists, IVF centroids).
# The reference JSON-stringifies containers (snowflake.js:479-524) —
# right for a SQL sink, wrong for a vector warehouse, where a
# stringified embedding can never round-trip back into the Arrow
# kernels. ``element`` carries the element type as a Spark
# simpleString ("float", "double", "bigint", "string", nested
# "array<float>").
ARRAY = "array"
# Engine extension: opaque byte payloads (bloom-filter bitmaps,
# image/audio/video content columns). The reference has no binary
# column concept (it JSON/UTF-8-stringifies everything non-scalar);
# a vector/multimodal warehouse must round-trip bytes EXACTLY — a
# bitmap or JPEG forced through a string column is corrupt on read.
BINARY = "binary"

ZERO_DATES = {"0000-00-00", "0000-00-00 00:00:00"}  # redshift.js:98-104


@dataclass(frozen=True)
class ColumnType:
    """Engine-level column type: lattice kind + varchar length metadata
    (+ element type simpleString for array columns)."""

    kind: str
    char_length: int = 0
    element: str = ""

    def to_spark(self) -> T.DataType:
        if self.kind == ARRAY:
            return T.ArrayType(_element_to_spark(self.element))
        return _SPARK_TYPES[self.kind]

    def render(self) -> str:
        """show_columns-style rendering (mysql.js:85-111 parity)."""
        if self.kind == VARCHAR:
            return f"varchar({self.char_length})"
        if self.kind == UNKNOWN:
            return "varchar(0)"
        if self.kind == ARRAY:
            return f"array<{self.element}>"
        return {BOOLEAN: "tinyint(1)", LONG: "bigint(20)", DOUBLE: "float",
                TIMESTAMP: "datetime", TEXT: "text",
                BINARY: "blob"}[self.kind]


_SPARK_TYPES: dict[str, T.DataType] = {
    UNKNOWN: T.NullType(),
    BOOLEAN: T.BooleanType(),
    LONG: T.LongType(),
    DOUBLE: T.DoubleType(),
    TIMESTAMP: T.TimestampType(),
    VARCHAR: T.StringType(),
    TEXT: T.StringType(),
    BINARY: T.BinaryType(),
}

# Element types resolved WITHOUT a SparkSession (DataType.fromDDL needs
# an active session — this module must stay importable/pure).
_ELEMENT_TYPES: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
}


def _element_to_spark(element: str) -> T.DataType:
    if element.startswith("array<") and element.endswith(">"):
        return T.ArrayType(_element_to_spark(element[6:-1]))
    # unknown element strings degrade to string, the lattice's safe sink
    return _ELEMENT_TYPES.get(element, T.StringType())


def infer_value_type(value, varchar_length: int = VARCHAR_DEFAULT_LENGTH) -> ColumnType:
    """Infer the lattice type of one Python value (mysql.js:416-433).

    Order matters: bool before int (bool is an int subclass in Python, and
    the reference checks boolean first, mysql.js:417-418).
    """
    if value is None:
        return ColumnType(UNKNOWN)
    if isinstance(value, bool):
        return ColumnType(BOOLEAN)
    if isinstance(value, int):
        return ColumnType(LONG)
    if isinstance(value, float):
        return ColumnType(DOUBLE)
    if isinstance(value, (_dt.datetime, _dt.date)):
        return ColumnType(TIMESTAMP)
    if isinstance(value, str):
        if value in ZERO_DATES:  # normalized to NULL before typing
            return ColumnType(UNKNOWN)
        if len(value) <= varchar_length:
            return ColumnType(VARCHAR, varchar_length)
        return ColumnType(TEXT)
    if isinstance(value, (bytes, bytearray)):
        return ColumnType(BINARY)
    if isinstance(value, (list, tuple)):
        # typed array column (engine extension — see ARRAY above); the
        # element type is the promotion over the items' scalar kinds.
        # A list-of-lists recurses: the promoted item is itself ARRAY and
        # its element grammar nests ("array<double>"), not the "string"
        # fallback — dropping to string here would silently repr-encode
        # nested vectors (and retype a DataFrame-created array<array<…>>
        # column on reconcile).
        elem = ColumnType(UNKNOWN)
        for item in value:
            elem = promote(elem, infer_value_type(item, varchar_length))
        if elem.kind == ARRAY:
            return ColumnType(ARRAY, element=f"array<{elem.element}>")
        return ColumnType(ARRAY, element=_ELEMENT_DDL.get(elem.kind, "string"))
    # dict/etc: the reference JSON-stringifies on write (snowflake.js:479-524)
    return ColumnType(TEXT)


def promote(a: ColumnType, b: ColumnType) -> ColumnType:
    """Least upper bound of two lattice types (mysql.js:412-414, 486-488)."""
    if a.kind == b.kind:
        if a.kind == VARCHAR:
            return ColumnType(VARCHAR, max(a.char_length, b.char_length))
        if a.kind == ARRAY and a.element != b.element:
            return ColumnType(
                ARRAY, element=_promote_elements(a.element, b.element)
            )
        return a
    if a.kind == UNKNOWN:
        return b
    if b.kind == UNKNOWN:
        return a
    pair = {a.kind, b.kind}
    if pair == {LONG, DOUBLE}:
        return ColumnType(DOUBLE)
    if pair == {VARCHAR, TEXT}:
        return ColumnType(TEXT)
    # any other mixed pair degrades to text (total-lattice choice).
    # That includes BINARY ∨ string-ish: a column that mixes raw bytes
    # with text has lost byte fidelity already; the stringly sink is
    # the lattice-total choice, same as every other incompatible mix.
    return ColumnType(TEXT)


# scalar lattice kind → array-element DDL (for inference over lists)
_ELEMENT_DDL = {
    BOOLEAN: "boolean",
    LONG: "bigint",
    DOUBLE: "double",
    TIMESTAMP: "timestamp",
    VARCHAR: "string",
    TEXT: "string",
    UNKNOWN: "string",
}

_INT_RANK = {"tinyint": 0, "smallint": 1, "int": 2, "bigint": 3}
_NUMERIC_ELEMENTS = set(_INT_RANK) | {"float", "double"}


def _promote_elements(a: str, b: str) -> str:
    """Join of two array-element types. A genuine semilattice join
    (tinyint<smallint<int<bigint<double, float<double, string on top),
    NOT a pair table — pairwise tables break associativity for
    three-way mixes like tinyint ∨ int ∨ float, and promote() must stay
    a least-upper-bound for hypothesis's algebra properties to hold
    over arrays too."""
    if a == b:
        return a
    if a.startswith("array<") and b.startswith("array<"):
        return f"array<{_promote_elements(a[6:-1], b[6:-1])}>"
    if a in _INT_RANK and b in _INT_RANK:
        return a if _INT_RANK[a] >= _INT_RANK[b] else b
    if a in _NUMERIC_ELEMENTS and b in _NUMERIC_ELEMENTS:
        return "double"
    return "string"


# element DDL → scalar lattice kind (for normalizing array items)
_DDL_TO_KIND = {
    "boolean": BOOLEAN,
    "tinyint": LONG,
    "smallint": LONG,
    "int": LONG,
    "bigint": LONG,
    "float": DOUBLE,
    "double": DOUBLE,
    "string": VARCHAR,
    "timestamp": TIMESTAMP,
}


def infer_column_types(
    rows: list[dict], varchar_length: int = VARCHAR_DEFAULT_LENGTH
) -> dict[str, ColumnType]:
    """Infer per-column types across a heterogeneous row batch.

    Key sets are unioned across rows (mysql.js:290-297); missing keys are
    NULL; all-NULL columns stay ``unknown`` (the varchar(0) sentinel,
    mysql.js:35-38) until later data re-types them.
    """
    out: dict[str, ColumnType] = {}
    for row in rows:
        for key, value in row.items():
            t = infer_value_type(value, varchar_length)
            out[key] = promote(out[key], t) if key in out else t
    return out


def to_struct_type(
    col_types: dict[str, ColumnType], primary_key: str | None = None
) -> T.StructType:
    """Build a Spark schema; primary key sorted first (mysql.js:449-455)."""
    names = list(col_types)
    if primary_key and primary_key in names:
        names.remove(primary_key)
        names.insert(0, primary_key)
    return T.StructType(
        [
            T.StructField(
                n,
                col_types[n].to_spark(),
                nullable=not (primary_key and n == primary_key),
            )
            for n in names
        ]
    )


def from_spark_type(dt: T.DataType, char_length: int = VARCHAR_DEFAULT_LENGTH) -> ColumnType:
    """Map a Spark type back into the lattice (for schema diffing)."""
    if isinstance(dt, T.NullType):
        return ColumnType(UNKNOWN)
    if isinstance(dt, T.BooleanType):
        return ColumnType(BOOLEAN)
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return ColumnType(LONG)
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return ColumnType(DOUBLE)
    if isinstance(dt, (T.TimestampType, T.DateType, T.TimestampNTZType)):
        return ColumnType(TIMESTAMP)
    if isinstance(dt, T.StringType):
        return ColumnType(VARCHAR, char_length)
    if isinstance(dt, T.BinaryType):
        return ColumnType(BINARY)
    if isinstance(dt, T.ArrayType):
        return ColumnType(ARRAY, element=dt.elementType.simpleString())
    return ColumnType(TEXT)


def normalize_value(value, col_type: ColumnType):
    """Write-side value normalization (redshift.js:71-104,
    snowflake.js:479-524): zero-dates→NULL, timestamps truncated to second
    resolution (test/connections/mysql.js:241), numbers coerced to the
    column's lattice kind, everything destined for a string column
    stringified.
    """
    if value is None:
        return None
    if isinstance(value, str) and value in ZERO_DATES:
        return None
    kind = col_type.kind
    if kind == TIMESTAMP:
        if isinstance(value, _dt.datetime):
            return value.replace(microsecond=0)
        if isinstance(value, _dt.date):
            return _dt.datetime(value.year, value.month, value.day)
        return value
    if kind == DOUBLE:
        if isinstance(value, bool):
            return float(value)
        if isinstance(value, (int, float)):
            return float(value)
        return value
    if kind == LONG:
        if isinstance(value, bool):
            return int(value)
        return value
    if kind == BOOLEAN:
        return bool(value) if isinstance(value, (bool, int)) else value
    if kind in (VARCHAR, TEXT):
        if isinstance(value, str):
            return value
        if isinstance(value, bool):
            return "true" if value else "false"
        if isinstance(value, _dt.datetime):
            return value.replace(microsecond=0).isoformat(sep=" ")
        return str(value)
    if kind == ARRAY:
        if isinstance(value, (list, tuple)):
            if col_type.element.startswith("array<"):
                elem = ColumnType(ARRAY, element=col_type.element[6:-1])
            else:
                elem = ColumnType(_DDL_TO_KIND.get(col_type.element, VARCHAR))
            return [normalize_value(v, elem) for v in value]
        return value
    return value


def normalize_rows(
    rows: list[dict], col_types: dict[str, ColumnType]
) -> list[tuple]:
    """Project heterogeneous row dicts onto the unified column set, in
    column order, with normalization applied. Missing keys → NULL
    (redshift.js:246-247)."""
    cols = list(col_types)
    return [
        tuple(normalize_value(row.get(c), col_types[c]) for c in cols)
        for row in rows
    ]
