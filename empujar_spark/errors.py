"""Error types + the reference's flattened error-context convention
(lib/book.js:279-288, 314-331; lib/utils.js:133-156)."""

from __future__ import annotations


class EmpujarError(Exception):
    """Base engine error carrying flattened context."""

    def __init__(self, message: str, context: dict | None = None) -> None:
        super().__init__(message)
        self.context = flatten(context or {})


class PageError(EmpujarError):
    """A page failed: fail-fast with {chapter, page} context
    (lib/book.js:280-288)."""


class UnknownConnectionType(EmpujarError, KeyError):
    """No factory registered for a connection config's 'type'.

    Subclasses KeyError for backward compatibility with callers that
    caught the old ``raise KeyError`` from build_connection."""


class PidLockError(EmpujarError):
    """Another instance is running (lib/book.js:84-101)."""


def flatten(obj: dict, prefix: str = "") -> dict:
    """Flatten a nested dict to dotted keys (lib/utils.js:133-156)."""
    out: dict = {}
    for k, v in obj.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten(v, key + "."))
        else:
            out[key] = v
    return out


def extract_from_array(arr):
    """First non-null element (lib/utils.js:121-131)."""
    return next((x for x in arr if x is not None), None)


def hash_merge(a: dict | None, b: dict | None) -> dict:
    """Shallow merge, a wins (lib/utils.js:19-43)."""
    return {**(b or {}), **(a or {})}
