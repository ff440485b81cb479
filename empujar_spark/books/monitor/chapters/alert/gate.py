"""ALERT chapter (priority 300): the retrain alarm. THIS run's report
rows gate against per-check thresholds — any breach raises, fail-fasting
the book (the reference's error contract, lib/book.js run/error events)
so a drifted model never silently keeps serving.

Defaults: psi > 0.25 (the classic credit-scoring retrain alarm) and
chi2 > 18.47 (the 0.001 critical value at 4 dof — the events
event_type's K−1). Override per book via ``book.drift_thresholds``
({check_name: threshold}; a check absent from the dict is not gated).

SLICED GATE (opt-in, VERDICT r14 item 7): the aggregate gate is the
default because per-segment alarm thresholds are segment-population-
dependent — but the per-segment report table exists precisely for the
drift an aggregate reads through (one shard's mix inverts, another
compensates), so a book that owns its slicing axis can set
``book.sliced_thresholds`` ({check_name: threshold}) and the gate also
sweeps ``drift_report_sliced`` rows. Population-awareness, the reason
this is not just the aggregate gate re-run per slice:

- Slice populations are recomputed from THIS run's stored snapshots on
  the book's own slice axis (``book.slice_expr``, same re-alias
  contract as the report page), so a signal for a slice that no longer
  exists in the current snapshot can never alarm — the stale-signal
  rule (ADVICE r13) applied to the slice axis, where churn is routine.
- Slices where either side has fewer than ``book.min_slice_rows``
  (default 100) rows are not gated: drift statistics on tiny segments
  are sampling noise, and a fixed threshold would page on every small
  tenant.
- The psi threshold gets a per-slice noise floor added: under NO drift,
  sampled PSI has expectation ≈ (B−1)·(1/n_ref + 1/n_cur) for B bins
  (first-order chi-square equivalence of PSI — each of the B−1 free
  bins contributes one chi-square-like term per side), so a slice with
  5k rows must clear a slightly higher bar than one with 5M. B follows
  the report page's n_bins (10).

SCHEMA GATE (opt-in, r16): a book that sets ``book.schema_strict =
True`` also fail-fasts when this run's ``schema_audit`` (the report
chapter's meta-diff page) is non-empty — a column added, removed, or
re-typed between the two snapshots is a pipeline-shape incident the
distributional thresholds can't price, and a strict deployment wants
it to page, not just to sit in the audit table. Off by default: the
audit-only behavior (observe, don't alarm) is the right default for
shapes that evolve legitimately.
"""

from pyspark.sql import functions as F

DEFAULT_THRESHOLDS = {"psi": 0.25, "chi2": 18.47}
DEFAULT_MIN_SLICE_ROWS = 100
REPORT_N_BINS = 10  # the report page's drift_report_sliced n_bins


def chapter_loader(book):
    chapter = book.add_chapter(300, "alert")
    wh = book.destination

    def gate():
        from empujar_spark.books.monitor import (
            CATEGORICAL_COLS,
            NUMERIC_COLS,
        )
        from empujar_spark.books.monitor.chapters.report.drift import (
            SLICE_COL,
        )

        thresholds = getattr(book, "drift_thresholds", DEFAULT_THRESHOLDS)
        # the report table is signal-sized (one row per monitored
        # check:feature) — collect once, gate driver-side. The report
        # chapter upserts on signal and never deletes, so the table
        # accumulates signals from since-removed monitored features;
        # restrict the gate to the feature set THIS run monitors
        # (ADVICE r13) so a stale signal can't keep raising the alarm.
        monitored = set(NUMERIC_COLS) | set(CATEGORICAL_COLS)
        # cardinality signals cover whatever the book opted in to —
        # those features are "monitored" for gating purposes too (r15)
        monitored |= set(getattr(book, "cardinality_cols", []) or [])
        rows = wh.read("drift_report").collect()
        breaches = [
            f"{r.signal} stat={r.stat} > {thresholds[r.check_name]}"
            for r in rows
            if r.feature in monitored
            and r.check_name in thresholds
            and r.stat is not None
            and r.stat > thresholds[r.check_name]
        ]

        sliced_thresholds = getattr(book, "sliced_thresholds", None)
        if sliced_thresholds:
            min_rows = getattr(
                book, "min_slice_rows", DEFAULT_MIN_SLICE_ROWS
            )
            slice_expr = getattr(
                book, "slice_expr", F.col("user_id") % 4
            ).alias(SLICE_COL)

            def pops(table: str) -> dict:
                # one groupBy(slice).count() per snapshot — reduces
                # map-side to one row per slice before the collect
                return {
                    r[SLICE_COL]: r["n"]
                    for r in wh.read(table)
                    .drop(SLICE_COL)
                    .select(slice_expr)
                    .select(F.col(SLICE_COL).cast("string"))
                    .groupBy(SLICE_COL)
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                }

            n_ref, n_cur = pops("events_reference"), pops("events_current")
            for r in wh.read("drift_report_sliced").collect():
                if (
                    r.feature not in monitored
                    or r.check_name not in sliced_thresholds
                    or r.stat is None
                ):
                    continue
                nr, nc = n_ref.get(r.slice, 0), n_cur.get(r.slice, 0)
                if min(nr, nc) < min_rows:
                    continue  # absent/stale or too small to gate
                thr = sliced_thresholds[r.check_name]
                if r.check_name == "psi":
                    thr += (REPORT_N_BINS - 1) * (1.0 / nr + 1.0 / nc)
                if r.stat > thr:
                    breaches.append(
                        f"{r.signal} stat={r.stat} > {round(thr, 6)}"
                        f" (slice n_ref={nr} n_cur={nc})"
                    )

        if getattr(book, "schema_strict", False):
            # change-sized by construction (the audit only holds diffs)
            for r in wh.read("schema_audit").collect():
                if r.status == "changed":
                    detail = f" {r.old_type}->{r.new_type}"
                else:  # added/removed carry one one-sided type
                    detail = f" ({r.new_type or r.old_type})"
                breaches.append(f"schema:{r.feature} {r.status}{detail}")

        if breaches:
            raise ValueError(f"drift alarm: {breaches}")

    chapter.add_page("drift-gate", gate)
