"""ALERT chapter (priority 300): the retrain alarm. THIS run's report
rows gate against per-check thresholds — any breach raises, fail-fasting
the book (the reference's error contract, lib/book.js run/error events)
so a drifted model never silently keeps serving.

Defaults: psi > 0.25 (the classic credit-scoring retrain alarm) and
chi2 > 18.47 (the 0.001 critical value at 4 dof — the events
event_type's K−1). Override per book via ``book.drift_thresholds``
({check_name: threshold}; a check absent from the dict is not gated).
"""

DEFAULT_THRESHOLDS = {"psi": 0.25, "chi2": 18.47}


def chapter_loader(book):
    chapter = book.add_chapter(300, "alert")
    wh = book.destination

    def gate():
        from empujar_spark.books.monitor import (
            CATEGORICAL_COLS,
            NUMERIC_COLS,
        )

        thresholds = getattr(book, "drift_thresholds", DEFAULT_THRESHOLDS)
        # the report table is signal-sized (one row per monitored
        # check:feature) — collect once, gate driver-side. The report
        # chapter upserts on signal and never deletes, so the table
        # accumulates signals from since-removed monitored features;
        # restrict the gate to the feature set THIS run monitors
        # (ADVICE r13) so a stale signal can't keep raising the alarm.
        monitored = set(NUMERIC_COLS) | set(CATEGORICAL_COLS)
        rows = wh.read("drift_report").collect()
        breaches = [
            f"{r.signal} stat={r.stat} > {thresholds[r.check_name]}"
            for r in rows
            if r.feature in monitored
            and r.check_name in thresholds
            and r.stat is not None
            and r.stat > thresholds[r.check_name]
        ]
        if breaches:
            raise ValueError(f"drift alarm: {breaches}")

    chapter.add_page("drift-gate", gate)
