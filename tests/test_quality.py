"""Unit tests for the declarative data-quality checks
(operators/quality.py)."""

from pyspark.sql import functions as F

from empujar_spark.operators import quality as Q


def test_checks_count_violations_exactly(spark):
    child = spark.createDataFrame(
        [(1, 10, 0.05, "A"), (1, 11, 0.5, "X"), (2, None, None, None)],
        "id int, fk int, d double, flag string",
    )
    parent = spark.createDataFrame([(10,), (99,)], "pk int")
    out = {
        r.check: (r.n_violations, r.passed)
        for r in Q.run_checks([
            Q.expect_unique(child, ["id"]),
            Q.expect_not_null(child, "fk"),
            Q.expect_in_range(child, "d", 0.0, 0.1),
            Q.expect_accepted_values(child, "flag", ["A", "B"]),
            Q.expect_references(child, "fk", parent, "pk"),
        ]).collect()
    }
    assert out["unique(id)"] == (1, 0)            # id=1 twice
    assert out["not_null(fk)"] == (1, 0)          # one NULL fk
    assert out["in_range(d,0.0,0.1)"] == (1, 0)   # 0.5 out; NULL not counted
    assert out["accepted_values(flag)"] == (1, 0) # 'X'; NULL not counted
    # fk=11 orphan; NULL fk never matches -> also orphan? LEFT ANTI keeps
    # NULL keys (no match possible) — both count as missing parents
    assert out["references(fk->pk)"] == (2, 0)


def test_expect_unique_null_key_semantics(spark):
    """Per-field NULLs are distinct key values, not collapsed: ('a',NULL),
    (NULL,'a') and (NULL,NULL) are three different keys; a repeated
    (NULL,NULL) row IS a violation (concat_ws would have collapsed the
    first two into one key AND skipped nothing — miscounting both ways)."""
    df = spark.createDataFrame(
        [("a", None), (None, "a"), (None, None), (None, None)],
        "k1 string, k2 string",
    )
    row = Q.expect_unique(df, ["k1", "k2"]).collect()[0]
    assert row.n_violations == 1  # only the duplicated (NULL, NULL)

    # Single NULL-bearing column: each NULL row is a key occurrence —
    # two NULLs = one duplicate, not "all NULLs collapse to ''".
    single = spark.createDataFrame([("x",), (None,), (None,)], "k string")
    assert Q.expect_unique(single, ["k"]).collect()[0].n_violations == 1


def test_all_green_on_clean_data(spark):
    df = spark.createDataFrame([(1, 0.05), (2, 0.07)], "id int, d double")
    out = Q.run_checks([
        Q.expect_unique(df, ["id"]),
        Q.expect_in_range(df, "d", 0.0, 0.1),
    ]).collect()
    assert all(r.passed == 1 and r.n_violations == 0 for r in out)


def test_expect_fresh_stale_and_fresh(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 10, 12, 0)),
         (2, dt.datetime(2024, 1, 10, 18, 0))],
        "id int, ts timestamp",
    )
    as_of = dt.datetime(2024, 1, 11, 0, 0)
    fresh = Q.run_checks(
        [Q.expect_fresh(df, "ts", as_of, max_age_hours=12)]
    ).collect()[0]
    stale = Q.run_checks(
        [Q.expect_fresh(df, "ts", as_of, max_age_hours=3)]
    ).collect()[0]
    empty = Q.run_checks(
        [Q.expect_fresh(df.filter("id > 99"), "ts", as_of, 1000)]
    ).collect()[0]
    assert (fresh.n_violations, fresh.passed) == (0, 1)
    assert (stale.n_violations, stale.passed) == (1, 0)
    assert (empty.n_violations, empty.passed) == (1, 0)


def test_expect_fused_matches_individual_checks(spark):
    """The fused single-scan evaluator (expect_fused) must be value-
    identical to unioning the individual expect_* helpers — same check
    names, same violation counts — including the distinct-aggregate
    (unique) next to plain sums, and the NULL-skipping range/accepted
    semantics. One scan instead of one per check is the optimization;
    this pins that it is ONLY a plan change."""
    df = spark.createDataFrame(
        [(1, 10, 0.05, "A"), (1, 11, 0.5, "X"), (2, None, None, None)],
        "id int, fk int, d double, flag string",
    )
    specs = [
        Q.unique_spec(["id"]),
        Q.not_null_spec("fk"),
        Q.in_range_spec("d", 0.0, 0.1),
        Q.accepted_values_spec("flag", ["A", "B"]),
    ]
    fused = {
        (r.check, r.n_violations, r.passed)
        for r in Q.run_checks([Q.expect_fused(df, specs)]).collect()
    }
    individual = {
        (r.check, r.n_violations, r.passed)
        for r in Q.run_checks([
            Q.expect_unique(df, ["id"]),
            Q.expect_not_null(df, "fk"),
            Q.expect_in_range(df, "d", 0.0, 0.1),
            Q.expect_accepted_values(df, "flag", ["A", "B"]),
        ]).collect()
    }
    assert fused == individual
    # one scan for the whole bundle: the fused plan holds exactly one
    # leaf over the input (the union-of-aggregates form holds one per
    # check — the redundancy the fusion removes)
    plan = Q.expect_fused(df, specs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") == 1


def test_expect_fused_empty_input_coalesces_to_zero(spark):
    """Fused checks over an EMPTY table: the single aggregate row still
    materializes and every count coalesces to 0 / passed=1 (the _one
    empty-input rule, preserved through the inline pivot)."""
    empty = spark.createDataFrame([], "id int, d double, flag string")
    out = Q.run_checks([
        Q.expect_fused(empty, [
            Q.unique_spec(["id"]),
            Q.not_null_spec("id"),
            Q.in_range_spec("d", 0.0, 1.0),
            Q.accepted_values_spec("flag", ["A"]),
        ]),
    ]).collect()
    assert len(out) == 4
    for r in out:
        assert r.n_violations == 0 and r.passed == 1, r


def test_checks_pass_on_empty_input(spark):
    """Aggregating an EMPTY table must yield n_violations=0 / passed=1 —
    sum() over zero rows is NULL, and a NULL passed flag silently slips
    through any `== 0` fail-fast gate (an empty corpus would publish)."""
    empty = spark.createDataFrame([], "id int, d double, flag string")
    out = Q.run_checks([
        Q.expect_not_null(empty, "id"),
        Q.expect_in_range(empty, "d", 0.0, 1.0),
        Q.expect_accepted_values(empty, "flag", ["A"]),
        Q.expect_unique(empty, ["id"]),
    ]).collect()
    for r in out:
        assert r.n_violations == 0 and r.passed == 1, r


def test_volume_anomaly_flags_spikes_not_constant_feeds(spark):
    """A flat feed has zero variance → NULL z, never flagged; a feed
    with one collapsed day flags exactly that day (|z| >= 2)."""
    import datetime as dt

    from empujar_spark.operators import quality as Q

    rows = []
    # source 'flat': 4 rows every day for 6 days
    for d in range(6):
        rows += [("flat", dt.datetime(2024, 1, 1 + d, 12))] * 4
    # source 'drop': 10 rows daily except day 4 collapses to 0... a
    # missing day produces NO group row (count aggregates can't see
    # absent data) — so model the collapse as a 1-row day instead
    for d in range(6):
        rows += [("drop", dt.datetime(2024, 1, 1 + d, 12))] * (1 if d == 3 else 10)
    df = spark.createDataFrame(rows, "src string, ts timestamp")
    out = {
        (r.src, r.day.day): (r.n_rows, r.z_score, r.is_anomaly)
        for r in Q.volume_anomaly(df, "ts", "src").collect()
    }
    assert all(z is None and a == 0 for (s, _), (_, z, a) in out.items() if s == "flat")
    flagged = [(d, v) for (s, d), v in out.items() if s == "drop" and v[2] == 1]
    assert [d for d, _ in flagged] == [4]
    assert flagged[0][1][1] < -2.0


def test_k_anonymity_violations(spark):
    from pyspark.sql import functions as F

    from empujar_spark.operators.quality import k_anonymity_violations

    rows = [("a", 1)] * 10 + [("a", 2)] * 3 + [("b", 1)] * 1
    df = spark.createDataFrame(rows, "qa string, qb int")
    out = k_anonymity_violations(df, ["qa", "qb"], k=8).collect()
    got = {(r.qa, r.qb, r.group_size) for r in out}
    assert got == {("a", 2, 3), ("b", 1, 1)}
    # every reported group is genuinely below k
    assert all(r.group_size < 8 for r in out)


def test_table_diff_statuses_and_null_semantics(spark):
    """table_diff (r15): added/removed/changed classification, the
    change-sized default output, include_unchanged opt-in, and the
    NULL→value content change that a naive equality join would miss."""
    from empujar_spark.operators.quality import table_diff

    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", None), (3, "c", "z")],
        "id long, s string, t string",
    )
    new = spark.createDataFrame(
        [(2, "b", "now-set"), (3, "c", "z"), (4, "d", "w")],
        "id long, s string, t string",
    )
    got = {
        r.id: r.status for r in table_diff(old, new, ["id"]).collect()
    }
    assert got == {1: "removed", 2: "changed", 4: "added"}
    full = {
        r.id: r.status
        for r in table_diff(
            old, new, ["id"], include_unchanged=True
        ).collect()
    }
    assert full[3] == "unchanged" and len(full) == 4
    # restricting compare_cols makes the NULL→value change invisible
    narrowed = {
        r.id: r.status
        for r in table_diff(old, new, ["id"], compare_cols=["s"]).collect()
    }
    assert 2 not in narrowed


def test_table_diff_fingerprint_injective_under_null_swaps(spark):
    """VERDICT r15 item 3 / ADVICE: the old concat_ws('|') fingerprint
    SKIPPED NULLs, so (a='x', b=NULL) vs (a=NULL, b='x') collided —
    'unchanged' for a genuinely changed row — and 'x|y' in one column
    collided with ('x','y') split across two. Fixed-width per-column
    md5 tokens make the encoding injective; both cases must now read
    'changed' (and a genuinely unchanged NULL-carrying row must not)."""
    from empujar_spark.operators.quality import table_diff

    old = spark.createDataFrame(
        [(1, "x", None), (2, "x|y", None), (3, None, "same"),
         (4, None, None)],
        "id long, a string, b string",
    )
    new = spark.createDataFrame(
        [(1, None, "x"), (2, "x", "y"), (3, None, "same"),
         (4, None, None)],
        "id long, a string, b string",
    )
    got = {
        r.id: r.status
        for r in table_diff(old, new, ["id"], include_unchanged=True).collect()
    }
    assert got == {
        1: "changed",    # NULL-adjacent column swap
        2: "changed",    # delimiter injection
        3: "unchanged",  # NULL in the same position stays unchanged
        4: "unchanged",  # all-NULL rows match each other
    }


def test_table_diff_partition_properties(spark):
    """Property test (hypothesis): for ANY pair of keyed frames, the
    diff's statuses partition the keys — added = keys(new)−keys(old),
    removed = keys(old)−keys(new), changed ⊆ intersection with
    differing compared values, and with include_unchanged=True the four
    statuses cover keys(old) ∪ keys(new) exactly once each."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from empujar_spark.operators.quality import table_diff

    vals = st.one_of(st.none(), st.sampled_from(["x", "y", "z"]))
    frame = st.dictionaries(
        st.integers(min_value=0, max_value=9), vals, max_size=8
    )

    @settings(max_examples=8, deadline=None)
    @given(old=frame, new=frame)
    def prop(old, new):
        o = spark.createDataFrame(
            [(k, v) for k, v in old.items()], "id long, v string"
        )
        n = spark.createDataFrame(
            [(k, v) for k, v in new.items()], "id long, v string"
        )
        got = {
            r.id: r.status
            for r in table_diff(
                o, n, ["id"], include_unchanged=True
            ).collect()
        }
        assert set(got) == set(old) | set(new)
        for k, status in got.items():
            if k not in old:
                assert status == "added"
            elif k not in new:
                assert status == "removed"
            elif old[k] != new[k]:
                assert status == "changed", (k, old[k], new[k])
            else:
                assert status == "unchanged"

    prop()


def test_schema_diff_classification(spark):
    """schema_diff (r16): status partition over the union of columns,
    change-only default, include_unchanged opt-in; lattice_schema
    renders a raw frame into the same vocabulary as warehouse metas."""
    from empujar_spark.operators.quality import lattice_schema, schema_diff

    old = {"a": "bigint(20)", "b": "varchar(255)", "c": "float"}
    new = {"a": "bigint(20)", "b": "text", "d": "datetime"}
    got = {
        r["column"]: (r.status, r.old_type, r.new_type)
        for r in schema_diff(spark, old, new).collect()
    }
    assert got == {
        "b": ("changed", "varchar(255)", "text"),
        "c": ("removed", "float", None),
        "d": ("added", None, "datetime"),
    }
    full = {
        r["column"]: r.status
        for r in schema_diff(spark, old, new, include_unchanged=True).collect()
    }
    assert full["a"] == "unchanged" and len(full) == 4

    df = spark.createDataFrame(
        [(1, "x", 1.5)], "id long, s string, v double"
    )
    assert lattice_schema(df) == {
        "id": "bigint(20)", "s": "varchar(255)", "v": "float"
    }
