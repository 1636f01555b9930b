"""Interval scalar predicates — reference F4
(``src/intervaltree/interval.py:36-149``), half-open ``[begin, end)``
semantics throughout (overlap: ``begin < other.end and end >
other.begin``, ``interval.py:36-54``).

All plain boolean/arithmetic column expressions — codegen-friendly,
usable directly as join conditions where Catalyst can still reorder
and push down the conjuncts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def overlaps(b1, e1, b2, e2) -> Column:
    """Half-open overlap (``interval.py:36-41``)."""
    return (_c(b1) < _c(e2)) & (_c(e1) > _c(b2))


def contains_point(b, e, p) -> Column:
    """``begin <= p < end`` (``interval.py:43-49``)."""
    return (_c(b) <= _c(p)) & (_c(p) < _c(e))


def contains_interval(b1, e1, b2, e2) -> Column:
    """Interval 1 envelops interval 2 (``interval.py:56-63`` range/
    envelop semantics: ``begin <= other.begin and other.end <= end``)."""
    return (_c(b1) <= _c(b2)) & (_c(e2) <= _c(e1))


def overlap_size(b1, e1, b2, e2) -> Column:
    """Length of the overlapping region, 0 when disjoint
    (``interval.py:65-83``)."""
    raw = F.least(_c(e1), _c(e2)) - F.greatest(_c(b1), _c(b2))
    return F.greatest(raw, F.lit(0))


def distance_to(b1, e1, b2, e2) -> Column:
    """Gap between intervals, 0 when overlapping/touching
    (``interval.py:123-137``)."""
    gap = F.greatest(_c(b1), _c(b2)) - F.least(_c(e1), _c(e2))
    return F.greatest(gap, F.lit(0))


def length(b, e) -> Column:
    """``end - begin`` (``interval.py:139-144``)."""
    return _c(e) - _c(b)


def is_null(b, e) -> Column:
    """Degenerate interval: ``begin >= end`` (``interval.py:112-117``)."""
    return _c(b) >= _c(e)
