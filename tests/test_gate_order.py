"""Audit trail for the driver-gate rotation (VERDICT r6 item 7).

The gate-order lists in plans/corpus.py are the rotation's record of
which entries carry driver evidence from which round. Hand-maintained
counts drifted in r6; these tests re-derive the census from the
committed CORRECTNESS_r0N.json files and assert the lists partition
CORPUS exactly — no entry unpinned-by-accident, none double-pinned,
none stale-labelled when it actually has fresher evidence.

Round-close routine (VERDICT r7 item 1): when a new CORRECTNESS_r0N.json
lands, re-pin every newly-evidenced middle-bucket entry into the proven
list for that round, then bump FROZEN_THROUGH below — the census tests
fail loudly until both happen, which is the audit doing its job.
"""

import json
import re
from pathlib import Path

from empujar_spark.plans.corpus import (
    CORPUS,
    _GATE_ORDER_R6_STALE,
    _GATE_ORDER_R7_PROVEN,
    _GATE_ORDER_R8_FIRST,
    _GATE_ORDER_ROWS_ONLY,
)

REPO = Path(__file__).resolve().parent.parent

# The newest CORRECTNESS record the census lists have been reconciled
# against. The r8 driver run will add CORRECTNESS_r08.json, after which
# the r9 rotation must recompute the lists and bump this to 8.
FROZEN_THROUGH = 7

LISTS = {
    "r8_first": _GATE_ORDER_R8_FIRST,
    "rows_only": _GATE_ORDER_ROWS_ONLY,
    "r6_stale": _GATE_ORDER_R6_STALE,
    "r7_proven": _GATE_ORDER_R7_PROVEN,
}


def _driver_rounds(through: int | None = None) -> dict[int, set[str]]:
    out = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        n = int(re.search(r"r(\d+)", f.name).group(1))
        if through is not None and n > through:
            continue
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
    # bucket — allowed, but they must be NEW relative to the reconciled
    # records (evidence from rounds newer than FROZEN_THROUGH is the
    # expected state of the middle bucket until the next rotation).
    middle = set(CORPUS) - union
    ever = set().union(*_driver_rounds(FROZEN_THROUGH).values())
    evidenced_middle = middle & ever
    assert not evidenced_middle, (
        f"entries with driver evidence missing from the gate lists: "
        f"{sorted(evidenced_middle)}"
    )


def test_census_matches_correctness_records():
    """Each list's evidence claim is literally true per the JSON record.

    Frozen against rounds 1-FROZEN_THROUGH; the next driver run adds a
    newer record, after which the rotation must recompute these lists
    (this test then forces the update by failing on any entry whose
    claimed staleness no longer matches the record).
    """
    rounds = _driver_rounds(FROZEN_THROUGH)
    for name in _GATE_ORDER_R8_FIRST:
        assert name in rounds[5] and name not in rounds[6] and name not in rounds[7], (
            f"{name} claimed r5-stale but record disagrees"
        )
    for name in _GATE_ORDER_ROWS_ONLY:
        assert CORPUS[name].sql is None, f"{name} has an oracle; not rows-only"
    for name in _GATE_ORDER_R6_STALE:
        assert name in rounds[6] and name not in rounds[7], (
            f"{name} claimed r6-stale but record disagrees"
        )
    for name in _GATE_ORDER_R7_PROVEN:
        assert name in rounds[7], f"{name} claimed r7-proven but not in r7 record"


def test_rows_only_entries_are_exactly_the_no_oracle_ones():
    no_oracle = {n for n, q in CORPUS.items() if q.sql is None}
    assert no_oracle == set(_GATE_ORDER_ROWS_ONLY), (
        "no-oracle corpus entries and the rows-only gate list diverged: "
        f"{sorted(no_oracle ^ set(_GATE_ORDER_ROWS_ONLY))}"
    )


def test_gate_head_is_the_stale_block():
    head = list(CORPUS)[: len(_GATE_ORDER_R8_FIRST)]
    assert head == list(_GATE_ORDER_R8_FIRST)


def test_no_record_newer_than_frozen_through():
    """Force the round-close re-pin: a CORRECTNESS record newer than
    FROZEN_THROUGH means the rotation (and this constant) must be
    updated in the same commit that lands the record."""
    newest = max(_driver_rounds())
    assert newest <= FROZEN_THROUGH, (
        f"CORRECTNESS_r{newest:02d}.json is newer than the reconciled "
        f"census (FROZEN_THROUGH={FROZEN_THROUGH}); re-pin the newly "
        "evidenced entries and bump FROZEN_THROUGH"
    )
