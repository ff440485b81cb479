"""Type-inference lattice goldens, mirroring the reference's
test/connections/mysql.js:216-352 (inference, promotion, widening)."""

import datetime as dt

from pyspark.sql import types as T

from empujar_spark.types import (
    BOOLEAN,
    DOUBLE,
    LONG,
    TEXT,
    TIMESTAMP,
    UNKNOWN,
    VARCHAR,
    ColumnType,
    infer_column_types,
    infer_value_type,
    normalize_rows,
    normalize_value,
    promote,
    to_struct_type,
)


def test_infer_value_goldens():
    # test/connections/mysql.js:216-248 — one row covering every kind
    assert infer_value_type(None).kind == UNKNOWN
    assert infer_value_type(True).kind == BOOLEAN
    assert infer_value_type(7).kind == LONG
    assert infer_value_type(1.5).kind == DOUBLE
    assert infer_value_type(dt.datetime(2020, 1, 1)).kind == TIMESTAMP
    assert infer_value_type("short").kind == VARCHAR
    assert infer_value_type("x" * 256).kind == TEXT
    assert infer_value_type("x" * 255).kind == VARCHAR


def test_rendered_types_match_reference():
    # mysql.js:416-433 getColumnDefinition renderings
    assert ColumnType(BOOLEAN).render() == "tinyint(1)"
    assert ColumnType(LONG).render() == "bigint(20)"
    assert ColumnType(DOUBLE).render() == "float"
    assert ColumnType(TIMESTAMP).render() == "datetime"
    assert ColumnType(VARCHAR, 191).render() == "varchar(191)"
    assert ColumnType(TEXT).render() == "text"
    assert ColumnType(UNKNOWN).render() == "varchar(0)"  # mysql.js:35-38


def test_promotions():
    # int→float (mysql.js:412-414), varchar→text (mysql.js:409-411),
    # unknown→anything (mysql.js:277-278)
    assert promote(ColumnType(LONG), ColumnType(DOUBLE)).kind == DOUBLE
    assert promote(ColumnType(VARCHAR, 255), ColumnType(TEXT)).kind == TEXT
    assert promote(ColumnType(UNKNOWN), ColumnType(LONG)).kind == LONG
    assert promote(ColumnType(LONG), ColumnType(UNKNOWN)).kind == LONG
    assert promote(ColumnType(VARCHAR, 100), ColumnType(VARCHAR, 255)).char_length == 255
    # incompatible pairs sink to text (documented total-lattice choice)
    assert promote(ColumnType(BOOLEAN), ColumnType(TIMESTAMP)).kind == TEXT


def test_heterogeneous_batch_union_of_keys():
    # mysql.js:290-297: key sets unioned, missing → NULL
    rows = [{"id": 1, "a": "x"}, {"id": 2, "b": 3}]
    types = infer_column_types(rows)
    assert set(types) == {"id", "a", "b"}
    tuples = normalize_rows(rows, types)
    assert tuples == [(1, "x", None), (2, None, 3)]


def test_all_null_column_stays_unknown_then_promotes():
    # varchar(0) sentinel → re-typed on first data (mysql.js:313-336)
    types = infer_column_types([{"id": 1, "c": None}])
    assert types["c"].kind == UNKNOWN
    types2 = infer_column_types([{"id": 2, "c": 9}])
    assert promote(types["c"], types2["c"]).kind == LONG


def test_normalize_values():
    # zero-date → NULL (redshift.js:98-104)
    assert normalize_value("0000-00-00 00:00:00", ColumnType(TIMESTAMP)) is None
    # second-resolution timestamps (test/connections/mysql.js:241)
    v = normalize_value(dt.datetime(2020, 1, 1, 1, 2, 3, 999999), ColumnType(TIMESTAMP))
    assert v == dt.datetime(2020, 1, 1, 1, 2, 3)
    assert normalize_value(2, ColumnType(DOUBLE)) == 2.0
    assert normalize_value(True, ColumnType(LONG)) == 1


def test_struct_type_pk_first_and_not_null():
    # PK sorted first + NOT NULL (mysql.js:436-455)
    st = to_struct_type(
        {"a": ColumnType(VARCHAR, 255), "id": ColumnType(LONG)}, primary_key="id"
    )
    assert st.fields[0].name == "id"
    assert st.fields[0].nullable is False
    assert isinstance(st.fields[0].dataType, T.LongType)


def test_array_lattice_inference_and_promotion():
    """Typed array columns (engine extension): lists infer to
    array<elem> with element promotion along the scalar lattice;
    mismatched arrays meet at array<string>; array vs scalar degrades
    to text (total-lattice choice)."""
    from empujar_spark import types as lt

    assert lt.infer_value_type([1, 2, 3]) == lt.ColumnType(lt.ARRAY, element="bigint")
    assert lt.infer_value_type([0.5, 1]) == lt.ColumnType(lt.ARRAY, element="double")
    assert lt.infer_value_type(["a", "b"]) == lt.ColumnType(lt.ARRAY, element="string")
    assert lt.infer_value_type([]) == lt.ColumnType(lt.ARRAY, element="string")
    a_f = lt.ColumnType(lt.ARRAY, element="float")
    a_d = lt.ColumnType(lt.ARRAY, element="double")
    assert lt.promote(a_f, a_d) == a_d
    assert lt.promote(a_d, a_d) == a_d
    assert lt.promote(a_d, lt.ColumnType(lt.ARRAY, element="string")) == lt.ColumnType(
        lt.ARRAY, element="string"
    )
    assert lt.promote(a_d, lt.ColumnType(lt.UNKNOWN)) == a_d
    assert lt.promote(a_d, lt.ColumnType(lt.LONG)) == lt.ColumnType(lt.TEXT)
    # spark round-trip: to_spark ∘ from_spark_type is the identity
    import pyspark.sql.types as T

    assert a_d.to_spark() == T.ArrayType(T.DoubleType())
    assert lt.from_spark_type(T.ArrayType(T.FloatType())) == a_f
    nested = lt.ColumnType(lt.ARRAY, element="array<float>")
    assert nested.to_spark() == T.ArrayType(T.ArrayType(T.FloatType()))
    assert lt.from_spark_type(nested.to_spark()) == nested
    assert nested.render() == "array<array<float>>"


def test_array_normalize_value():
    from empujar_spark import types as lt

    a_d = lt.ColumnType(lt.ARRAY, element="double")
    assert lt.normalize_value([1, 2.5, None], a_d) == [1.0, 2.5, None]
    a_s = lt.ColumnType(lt.ARRAY, element="string")
    assert lt.normalize_value([1, "x"], a_s) == ["1", "x"]
    assert lt.normalize_value(None, a_d) is None


def test_nested_list_inference_keeps_inner_element_type():
    from empujar_spark.types import (
        ColumnType, infer_value_type, normalize_value, promote,
    )

    t = infer_value_type([[1.0, 2.0], [3.0]])
    assert (t.kind, t.element) == ("array", "array<double>")
    # values pass through untouched (no repr-stringification)
    assert normalize_value([[1.0, 2.0]], t) == [[1.0, 2.0]]
    # int inner elements promote within the nested grammar
    t2 = infer_value_type([[1, 2]])
    assert t2.element == "array<bigint>"
    # reconcile against the same DataFrame-derived type is a no-op
    assert promote(t, ColumnType("array", element="array<double>")) == t
