"""Audit trail for the driver-gate rotation (VERDICT r6 item 7).

The gate-order lists in plans/corpus.py are the rotation's record of
which entries carry driver evidence from which round. Hand-maintained
counts drifted in r6; these tests re-derive the census from the
committed CORRECTNESS_r0N.json files and assert the lists partition
CORPUS exactly — no entry unpinned-by-accident, none double-pinned,
none stale-labelled when it actually has fresher evidence.
"""

import json
import re
from pathlib import Path

from empujar_spark.plans.corpus import (
    CORPUS,
    _GATE_ORDER_R5_STALE,
    _GATE_ORDER_R6_PROVEN,
    _GATE_ORDER_R7_FIRST,
    _GATE_ORDER_ROWS_ONLY,
)

REPO = Path(__file__).resolve().parent.parent

LISTS = {
    "r7_first": _GATE_ORDER_R7_FIRST,
    "rows_only": _GATE_ORDER_ROWS_ONLY,
    "r5_stale": _GATE_ORDER_R5_STALE,
    "r6_proven": _GATE_ORDER_R6_PROVEN,
}


def _driver_rounds() -> dict[int, set[str]]:
    out = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        n = int(re.search(r"r(\d+)", f.name).group(1))
        out[n] = set(json.loads(f.read_text()).keys())
    return out


def test_lists_are_internally_duplicate_free():
    for label, lst in LISTS.items():
        assert len(lst) == len(set(lst)), f"{label} has duplicates"


def test_lists_partition_corpus():
    union: set[str] = set()
    for label, lst in LISTS.items():
        overlap = union & set(lst)
        assert not overlap, f"{label} re-pins already-pinned entries: {sorted(overlap)}"
        union |= set(lst)
    pinned_unknown = union - set(CORPUS)
    assert not pinned_unknown, f"pinned names not in CORPUS: {sorted(pinned_unknown)}"
    # Entries in CORPUS but in no list are the 'new this round' middle
    # bucket — allowed, but they must be NEW (no driver evidence yet).
    middle = set(CORPUS) - union
    ever = set().union(*_driver_rounds().values())
    evidenced_middle = middle & ever
    assert not evidenced_middle, (
        f"entries with driver evidence missing from the gate lists: "
        f"{sorted(evidenced_middle)}"
    )


def test_census_matches_correctness_records():
    """Each list's evidence claim is literally true per the JSON record.

    Frozen against rounds 1-6: the r7 driver run will add
    CORRECTNESS_r07.json, after which the r8 rotation must recompute
    these lists (this test then forces the update by failing on any
    entry whose claimed staleness no longer matches the record).
    """
    rounds = {n: keys for n, keys in _driver_rounds().items() if n <= 6}
    ever = set().union(*rounds.values())
    for name in _GATE_ORDER_R7_FIRST:
        assert name not in ever, f"{name} claimed never-checked but has driver rows"
    for name in _GATE_ORDER_ROWS_ONLY:
        assert CORPUS[name].sql is None, f"{name} has an oracle; not rows-only"
    for name in _GATE_ORDER_R5_STALE:
        assert name in rounds[5] and name not in rounds[6], (
            f"{name} claimed r5-stale but record disagrees"
        )
    for name in _GATE_ORDER_R6_PROVEN:
        assert name in rounds[6], f"{name} claimed r6-proven but not in r6 record"


def test_rows_only_entries_are_exactly_the_no_oracle_ones():
    no_oracle = {n for n, q in CORPUS.items() if q.sql is None}
    assert no_oracle == set(_GATE_ORDER_ROWS_ONLY), (
        "no-oracle corpus entries and the rows-only gate list diverged: "
        f"{sorted(no_oracle ^ set(_GATE_ORDER_ROWS_ONLY))}"
    )


def test_gate_head_is_the_never_checked_block():
    head = list(CORPUS)[: len(_GATE_ORDER_R7_FIRST)]
    assert head == list(_GATE_ORDER_R7_FIRST)
