"""Per-SparkContext memoization for Column expression trees.

The crawl wave loop rebuilds the same (unresolved) Column trees every wave
— canonical-URL chain, verification panels, status cascade, politeness
budgets.  Each `F.*` call is a py4j round trip (~0.3-0.5 ms), and a wave's
plan construction measures ~2,000 round trips ≈ 1-2 s of *pure driver
latency* that does not shrink with cluster size — a direct contributor to
the N→4N scaling-efficiency gate (VERDICT r2).

Column objects are immutable JVM expression trees over *unresolved*
attribute names, so a tree built once is reusable across any number of
DataFrames within the same JVM.  `session_memo` caches the built tree keyed
on the active SparkContext (tests stop/start sessions; a tree from a dead
JVM must not leak into the next one) plus the builder's (hashable) args.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

_CACHE: dict[tuple, Any] = {}


def _context_key() -> int:
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    return id(sc) if sc is not None else 0


def session_memo(fn: Callable) -> Callable:
    """Memoize a Column-tree builder per (SparkContext, args).

    Only use on builders whose args are hashable (column *names*, numbers)
    and whose output references columns by name — never on functions taking
    DataFrames or Column objects (those differ per call site).
    """

    @functools.wraps(fn)
    def wrapper(*args: Any) -> Any:
        key = (_context_key(), fn.__module__, fn.__qualname__, args)
        try:
            return _CACHE[key]
        except KeyError:
            _CACHE[key] = fn(*args)
            return _CACHE[key]

    wrapper.__wrapped__ = fn  # uncached access for tests
    return wrapper


def clear_expr_cache() -> None:
    _CACHE.clear()
