"""Guards on bench.py's HEADLINE manifest.

The round-7 copy/paste gave two entries the same label ("burstiness"),
and because the timings dict is keyed by label the later entry silently
SHADOWED the earlier one for three rounds — the recorded history
belonged to a different query than the label claimed (found round 10,
renamed round 11). These invariants make that class impossible to
reintroduce, without starting a Spark session.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def test_headline_labels_unique():
    labels = [n for n, _ in bench.HEADLINE]
    dupes = {n for n in labels if labels.count(n) > 1}
    assert not dupes, (
        f"duplicate HEADLINE labels shadow each other in the timings "
        f"dict: {sorted(dupes)}")


def test_headline_functions_are_registered_queries():
    """Every benched callable must BE a registry entry (same object),
    so bench timings always describe code the driver also grades; a
    bench-only variant would drift from the graded plan unnoticed."""
    registered = {id(f) for f in entrymod.queries().values()}
    strays = [n for n, f in bench.HEADLINE if id(f) not in registered]
    assert not strays, f"HEADLINE entries not in the registry: {strays}"


def test_headline_functions_distinct():
    """Two labels timing the SAME function is the dual of the label
    collision: one of them is mislabeled history."""
    fns = [id(f) for _, f in bench.HEADLINE]
    assert len(fns) == len(set(fns)), "two HEADLINE labels share one fn"
