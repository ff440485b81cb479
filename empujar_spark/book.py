"""Book: the serial orchestration driver.

Reference semantics (lib/book.js):
- chapters registered with integer priorities, kept sorted
  (lib/book.js:206-225), run strictly in series (async.series,
  lib/book.js:297) — each chapter is a barrier.
- chapter selection: ``chapters="1,4"`` lists or ``"100-300"`` ranges
  (lib/book.js:25-38, 245-248).
- pidfile single-instance lock (lib/book.js:79-106).
- lifecycle ``state`` events with the fixed audit schema
  {state, time, name, duration, data} (lib/book.js:234-241, 252-276,
  302-310, 320-328), flushed to an ``empujar`` audit table
  (books/etl/book.js:13-15).
- fail-fast: the first page error stops the run and surfaces flattened
  {chapter, page} context (lib/book.js:279-288, 314-331).
"""

from __future__ import annotations

import datetime as _dt
import json
import logging
import os
import time
from typing import Callable

from empujar_spark.chapter import Chapter
from empujar_spark.errors import PidLockError, UnknownConnectionType

logger = logging.getLogger("empujar_spark")


class Book:
    @staticmethod
    def defaults() -> dict:
        """The reference's defaults hash (lib/book.js:59-75): cwd-derived
        book name + conventional directory layout. Ctor kwargs/``options``
        overlay these, exactly like the reference's options merge."""
        cwd = os.getcwd()
        name = os.path.basename(cwd) or "book"
        return {
            "name": name,
            "chapter_files": os.path.join(cwd, "chapters", "**", "*.py"),
            "config_path": os.path.join(cwd, "config"),
            "log_path": os.path.join(cwd, "log"),
            "pids_path": os.path.join(cwd, "pids"),
            "log_file": f"{name}.log",
            "tmp_path": os.path.join(cwd, "tmp"),
            "log_stdout": True,
            "log_level": "info",
            "chapters": [],
            "get_all_limit": None,  # reference: Infinity = no cap
            "fail_on_connection_error": True,
            "dump_log_timer_s": 30.0,  # mysql.js:31-33 dumpLogTimer
        }

    def __init__(
        self,
        spark=None,
        name: str | None = None,
        chapter_filter: str | None = None,
        pid_dir: str | None = None,
        get_all_limit: int | None = None,  # lib/book.js:74 getAllLimit
        log_state_events: bool = True,
        options: dict | None = None,
    ) -> None:
        self.options = {**self.defaults(), **(options or {})}
        if name is not None:
            self.options["name"] = name
        if get_all_limit is not None:
            self.options["get_all_limit"] = get_all_limit
        self.spark = spark
        self.name = self.options["name"]
        self.chapters: list[Chapter] = []
        self.chapter_filter = _parse_chapter_filter(chapter_filter)
        self.pid_dir = pid_dir
        self.get_all_limit = self.options["get_all_limit"]
        self.log_state_events = log_state_events
        self.state_events: list[dict] = []
        self.connections: dict[str, object] = {}
        self.on_state: list[Callable[[dict], None]] = []
        self.on_error: list[Callable[[Exception], None]] = []
        self._pidfile: str | None = None

    # ------------------------------------------------------------ connections
    def add_connection(self, name: str, connection) -> None:
        """Registry of connections (lib/book.js:124-129 hash shape)."""
        self.connections[name] = connection
        setattr(self, name, connection)

    def connect(self, config_dir: str) -> None:
        """Config-driven connection discovery (lib/book.js:113-171): glob
        ``<config_dir>/connections/*.json``, each ``{"name", "type",
        "options": {...}}``, build via the type registry. Custom types
        register through :func:`register_connection_type` — the analogue of
        the reference's local ``connections/TYPE.js`` overrides
        (lib/book.js:176-184: local resolution wins over builtin)."""
        import glob as _glob
        import json as _json

        pattern = os.path.join(config_dir, "connections", "*.json")
        for path in sorted(_glob.glob(pattern)):
            with open(path) as f:
                cfg = _json.load(f)
            # resolve the type OUTSIDE the registry try: a config missing
            # 'type' (or a KeyError raised inside a factory) must not be
            # misreported as an unknown type — and the old skip branch
            # itself re-read cfg['type'], crashing on its own recovery path
            ctype = cfg.get("type")
            try:
                if ctype is None:
                    raise UnknownConnectionType(f"{path}: no 'type' field")
                conn = build_connection(
                    self.spark, ctype, cfg.get("options", {})
                )
            except UnknownConnectionType:
                # lib/book.js:188-190: unknown type → log + skip (unless
                # failOnConnectionError)
                if self.options.get("fail_on_connection_error", True):
                    raise
                logger.error(
                    "unknown connection type: %s; skipping connection: %s",
                    ctype, cfg.get("name", path),
                )
                continue
            self.add_connection(cfg.get("name", os.path.basename(path)[:-5]), conn)

    # --------------------------------------------------------------- chapters
    def load_chapters(self, chapter_files: str | None = None) -> list[str]:
        """Chapter-module discovery (lib/book.js:194-204): glob the chapter
        files — default ``<cwd>/chapters/**/*.py``, mirroring the
        reference's ``chapterFiles`` default (lib/book.js:65) — import each
        file, and call every public module-level function it defines as a
        ``loader(book)`` (the reference calls every export). Returns the
        ``path:function`` names invoked, in deterministic (sorted) order."""
        import glob as _glob
        import importlib.util
        import inspect
        import re

        pattern = chapter_files or self.options["chapter_files"]
        invoked: list[str] = []
        for path in sorted(_glob.glob(pattern, recursive=True)):
            if os.path.basename(path).startswith("_"):
                continue
            mod_name = "empujar_chapters_" + re.sub(r"\W", "_", os.path.abspath(path))
            spec = importlib.util.spec_from_file_location(mod_name, path)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            for key in sorted(vars(mod)):
                fn = getattr(mod, key)
                if key.startswith("_") or not inspect.isfunction(fn):
                    continue
                if fn.__module__ != mod.__name__:  # imported, not defined here
                    continue
                fn(self)
                invoked.append(f"{path}:{key}")
        return invoked

    def add_chapter(self, priority: int, name: str, threads: int = 1) -> Chapter:
        chapter = Chapter(self, priority, name, threads)
        self.chapters.append(chapter)
        self.chapters.sort(key=lambda c: c.priority)  # lib/book.js:217-225
        return chapter

    def _selected_chapters(self) -> list[Chapter]:
        if self.chapter_filter is None:
            return list(self.chapters)
        return [c for c in self.chapters if c.priority in self.chapter_filter]

    # -------------------------------------------------------------- pid lock
    def ensure_pid(self) -> None:
        """Single-instance lock (lib/book.js:79-106)."""
        if not self.pid_dir:
            return
        os.makedirs(self.pid_dir, exist_ok=True)
        path = os.path.join(self.pid_dir, f"{self.name}.pid")
        if os.path.exists(path):
            with open(path) as f:
                old = int(f.read().strip() or 0)
            if old and _pid_running(old):
                raise PidLockError(
                    f"pidfile exists and process is running: {old}",
                    {"pidfile": path},
                )
        with open(path, "w") as f:
            f.write(str(os.getpid()))
        self._pidfile = path

    def remove_pid(self) -> None:
        if self._pidfile and os.path.exists(self._pidfile):
            os.remove(self._pidfile)
        self._pidfile = None

    # ----------------------------------------------------------- state events
    @staticmethod
    def log_emphatically(message: str, width: int = 60) -> None:
        """Banner logging (reference lib/logger.js:44-66 ``emphatically``):
        the run-delimiting marker operators use around chapter boundaries."""
        bar = "#" * width
        logger.info(bar)
        logger.info("#  %s", message)
        logger.info(bar)

    def log_state(self, state: str, name: str = "", duration: float | None = None,
                  data: dict | None = None) -> None:
        event = {
            "state": state,
            "time": _dt.datetime.utcnow().replace(microsecond=0),
            "name": name,
            "duration": round(duration, 6) if duration is not None else None,
            "data": json.dumps(data) if data else None,
        }
        self.state_events.append(event)
        if self.log_state_events:
            logger.info("%s %s %s", state, name,
                        f"({duration:.2f}s)" if duration is not None else "")
        for cb in self.on_state:
            cb(event)

    def flush_audit(self, warehouse, table: str = "empujar") -> None:
        """Append state events to the audit table (books/etl/book.js:13-15)."""
        if not self.state_events:
            return
        warehouse.insert_data(table, self.state_events, merge_on_duplicates=False)
        self.state_events = []

    # -------------------------------------------------------------------- run
    def run(self) -> None:
        self.ensure_pid()
        self.log_state("book:start", name=self.name)
        started = time.monotonic()
        try:
            for chapter in self._selected_chapters():  # serial barrier per chapter
                chapter.run()
        except Exception as exc:
            for cb in self.on_error:
                cb(exc)
            self.log_state("book:error", name=self.name,
                           data={"error": str(exc),
                                 **getattr(exc, "context", {})})
            raise
        finally:
            self.log_state("book:end", name=self.name,
                           duration=time.monotonic() - started)
            self.remove_pid()


# ---------------------------------------------------------------------
# Connection type registry (buildConnection, lib/book.js:173-192).
# Custom (user) registrations take precedence over builtins, mirroring
# the reference's local-connections-dir override resolution.
_CUSTOM_CONNECTION_TYPES: dict = {}


def register_connection_type(type_name: str, factory) -> None:
    """Register a custom connection factory: ``factory(spark, **options)``."""
    _CUSTOM_CONNECTION_TYPES[type_name] = factory


def _builtin_connection_types() -> dict:
    from empujar_spark.catalog import Warehouse
    from empujar_spark.sources import DocumentIndex, FileStore, JdbcSource

    return {
        "warehouse": lambda spark, **o: Warehouse(spark, **o),
        "files": lambda spark, **o: FileStore(spark, **o),
        "documents": lambda spark, **o: DocumentIndex(spark),
        "jdbc": lambda spark, **o: JdbcSource(spark, **o),
    }


def build_connection(spark, type_name: str, options: dict):
    factory = _CUSTOM_CONNECTION_TYPES.get(type_name)
    if factory is None:
        factory = _builtin_connection_types().get(type_name)
    if factory is None:
        raise UnknownConnectionType(f"unknown connection type: {type_name}")
    return factory(spark, **options)


def _parse_chapter_filter(spec: str | None):
    """Parse ``"1,4"`` / ``"100-300"`` selections (lib/book.js:25-38)."""
    if spec is None or spec == "":
        return None
    selected: set[int] = set()
    for part in str(spec).split(","):
        part = part.strip()
        if "-" in part:
            lo, hi = part.split("-", 1)
            selected.update(range(int(lo), int(hi) + 1))
        elif part:
            selected.add(int(part))
    return selected


def _pid_running(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except PermissionError:
        # EPERM means the process EXISTS but belongs to another user —
        # the lock must hold (treating it as dead would let a second
        # instance overwrite the pidfile and run concurrently)
        return True
    except OSError:
        return False
    return True
