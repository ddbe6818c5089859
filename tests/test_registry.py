"""Registry invariants for the driver's bounded correctness sweep.

The driver walks keys in registry order with a ~50-key budget, so
``_SWEEP_ORDER`` IS the sampling policy: a typo'd or stale entry
silently sorts the real key to rank -1 (the FRONT), displacing a
never-checked key from the budget — exactly the failure mode the RULE
comment in registry.py warns about. These tests make that comment
enforceable. No Spark session needed: ``collect()`` only imports
modules and builds dicts.
"""

from __future__ import annotations

from graph_database_akkatyped_spark import registry


def test_sweep_order_matches_registered_keys_exactly():
    queries, _ = registry.collect()
    registered = set(queries)
    ordered = set(registry._SWEEP_ORDER)
    # availability-gated keys may appear in _SWEEP_ORDER yet be absent
    # from collect() on runtimes lacking their dependency — allow those
    # by name so a genuinely stale entry still fails loudly
    gated = {"stream_stateful_minmax"}
    assert registered - ordered == set(), (
        "registered keys missing from _SWEEP_ORDER (they would sort to "
        f"rank -1 and hijack the sweep budget): {sorted(registered - ordered)}"
    )
    assert ordered - registered - gated == set(), (
        "stale _SWEEP_ORDER entries (typo or removed key): "
        f"{sorted(ordered - registered - gated)}"
    )


def test_sweep_order_has_no_duplicates():
    order = registry._SWEEP_ORDER
    seen: dict[str, int] = {}
    dupes = []
    for k in order:
        if k in seen:
            dupes.append(k)
        seen[k] = 1
    assert not dupes, f"duplicate _SWEEP_ORDER entries: {dupes}"


def test_every_oracle_key_is_registered():
    queries, oracles = registry.collect()
    assert set(oracles) <= set(queries)
