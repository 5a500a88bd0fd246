"""Operator layer: thin, typed builders over DataFrame ops covering every
row of SURVEY.md §2, so the capability surface is explicit and testable.
All operators are partition-scalable — no driver-side collects, no
row-at-a-time Python in hot paths.
"""
