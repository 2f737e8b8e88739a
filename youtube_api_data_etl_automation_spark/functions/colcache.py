"""Name-keyed memoization for pure Column-fragment builders (r14 opt).

A pyspark ``Column`` is an immutable, UNRESOLVED expression tree held
in the JVM; every node costs one driver↔JVM round-trip (~0.25 ms on
this box) to construct. Builders like ``url_normalize()`` are pure
functions of their input, yet each call site re-issues every
round-trip to rebuild a byte-identical tree — the r14 profile
measured 20,610 round-trips (~4.8 s, ALL driver-side latency, zero
Spark jobs) for one ``url_compliance_docs`` construct. When the
input is a plain column NAME the resulting tree contains only
unresolved attributes, so the same Column object is reusable across
DataFrames and queries — the analyzer binds it per-plan at
resolution time, exactly as it re-resolves a SQL view body. This is
the optimization-guide §1.2 step-2 lever (per-"task" work, where the
task here is the driver's plan construction) applied after §7.3's
"driver is doing something single-threaded" diagnosis.

Rules:
- only builders that are PURE functions of hashable scalar arguments
  may be decorated; a ``Column``/``DataFrame`` argument disables the
  cache for that call (the tree would embed the caller's arbitrary
  expression),
- the cache never holds data, results, or query plans bound to an
  input path — only unresolved expression fragments (re-running a
  query still re-reads and re-computes everything),
- entries are keyed by the py4j gateway incarnation so a restarted
  JVM can never serve stale JavaObject refs.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

_SCALARS = (str, int, float, bool, type(None))

_CACHE: dict[tuple, Any] = {}


def _jvm_token() -> int | None:
    """Identity of the live py4j gateway (None before JVM launch)."""
    from pyspark import SparkContext

    gw = SparkContext._gateway
    return None if gw is None else id(gw)


def name_memo(fn: Callable) -> Callable:
    """Memoize ``fn(*args, **kwargs)`` when every argument is a
    hashable scalar (the plain-column-name case). Any non-scalar
    argument — a Column, a DataFrame, a list — falls through to a
    plain call, so decorated builders keep their full signature."""

    def _keyable(a: Any) -> bool:
        if isinstance(a, _SCALARS):
            return True
        if isinstance(a, tuple):  # scalar tuples (e.g. a stopword list)
            return all(_keyable(x) for x in a)
        return False

    @functools.wraps(fn)
    def wrapped(*args: Any, **kwargs: Any):
        vals = args + tuple(kwargs.values())
        if any(not _keyable(a) for a in vals):
            return fn(*args, **kwargs)
        key = (
            _jvm_token(),
            fn.__module__,
            fn.__qualname__,
            args,
            tuple(sorted(kwargs.items())),
        )
        try:
            return _CACHE[key]
        except KeyError:
            _CACHE[key] = fn(*args, **kwargs)
            return _CACHE[key]

    wrapped.__wrapped__ = fn
    return wrapped


def memo_call(tag: str, key: tuple, thunk: Callable[[], Any]):
    """Explicit-key variant of :func:`name_memo` for builders whose
    natural arguments are unhashable (a schema dict, a DataFrame) but
    whose OUTPUT is a pure function of a derivable scalar signature —
    the caller supplies that signature as ``key``. Same cache, same
    JVM-incarnation guard."""
    k = (_jvm_token(), tag, key)
    try:
        return _CACHE[k]
    except KeyError:
        _CACHE[k] = thunk()
        return _CACHE[k]
