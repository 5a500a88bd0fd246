"""Focused pins for the r16 optimization-round internals changes."""

from __future__ import annotations

from streambench_spark.catalog import _DF_MEMO, _SCHEMA_MEMO, _LRUMemo


def test_lru_memo_bounds_growth():
    """The catalog memos must stay bounded in a long-lived session that
    loads many distinct paths (VERDICT r15 item 7): eviction is
    least-recently-USED, so a looping workload's working set stays
    resident while one-shot paths age out."""
    m = _LRUMemo(maxsize=4)
    for i in range(10):
        m[("k", i)] = i
    assert len(m) == 4
    # the most recent 4 survive
    assert set(m.keys()) == {("k", i) for i in (6, 7, 8, 9)}
    # a get() refreshes recency: key 6 survives the next insert, 7 doesn't
    assert m.get(("k", 6)) == 6
    m[("k", 10)] = 10
    assert m.get(("k", 6)) == 6
    assert m.get(("k", 7)) is None


def test_catalog_memos_are_lru_bounded():
    assert isinstance(_SCHEMA_MEMO, _LRUMemo)
    assert isinstance(_DF_MEMO, _LRUMemo)
    assert _SCHEMA_MEMO._maxsize >= 64  # plenty for a bench run's tables
    assert _DF_MEMO._maxsize >= 64
