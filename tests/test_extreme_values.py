"""Deterministic pin of the extreme-value domain-cap probe.

VERDICT r14 item 3: the decimal-headroom claim on the value-domain
power-sum accumulators was proven once, manually, after the r14 close;
this test re-proves it every run. The fixture (30 events cycling
1000.00 / 999.99 / 551.09 / 0.01 — the `validate_events` cap, one cent
under, just past the ~55,108-cent c⁴-in-BIGINT bound, and the low
edge) and the 24-query value-domain set are owned by
scripts/extreme_value_probe.py, which is also the close-gate command.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from scripts.extreme_value_probe import (  # noqa: E402
    VALUE_DOMAIN_QUERIES,
    run_probe,
)


def test_value_domain_queries_green_at_domain_cap(spark):
    failures = run_probe(spark, VALUE_DOMAIN_QUERIES)
    assert not failures, failures
