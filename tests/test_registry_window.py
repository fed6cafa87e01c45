"""Integrity of the driver-facing measurement window (registry.DRIVER_WINDOW).

The external driver records correctness rows for the FIRST 50 registry
entries only; these tests pin the manifest that decides those 50 so the
window can never silently curate the evaluation surface:

- fixed size, no duplicates, every name resolvable;
- the flagship pins are always present;
- the rotating slots hold exactly the least-recently-driver-checked
  rows (staleness priority, round 13) — never-checked rows first, ties
  alphabetical — derived only from committed CORRECTNESS_r*.json
  artifacts, zero discretion;
- simulated forward: every oracle-backed row is re-checked within
  ceil(pool/slots) consecutive rounds even as artifacts land;
- the registry dict is actually reordered so queries() yields the
  window first (the property the driver relies on).
"""

import math

from vectorsearch_with_hnsw_spark import registry


def _pool():
    return sorted(
        name
        for name, (_, sql) in registry.REGISTRY.items()
        if sql is not None and name not in registry.WINDOW_PINS
    )


def test_window_size_and_uniqueness():
    assert len(registry.DRIVER_WINDOW) == registry.WINDOW_SIZE == 50
    assert len(set(registry.DRIVER_WINDOW)) == len(registry.DRIVER_WINDOW)
    assert all(name in registry.REGISTRY for name in registry.DRIVER_WINDOW)


def test_pins_always_in_window():
    window = registry._build_driver_window(registry._driver_round())
    for pin in registry.WINDOW_PINS:
        assert pin in window, f"pin {pin} missing"


def test_pins_are_oracle_backed():
    # a pinned slot that can only produce a rows-only row would waste a
    # driver correctness slot every round
    for pin in registry.WINDOW_PINS:
        assert registry.REGISTRY[pin][1] is not None, f"pin {pin} has no oracle"


def test_window_is_exactly_the_stalest_rows():
    """The rotating slots must be the (last-checked, name)-minimal rows
    of the pool — the zero-discretion property. Recomputed here from
    the artifacts independently of _build_driver_window's own code
    path."""
    last = registry._last_driver_checked()
    expected = sorted(_pool(), key=lambda n: (last.get(n, 0), n))
    slots = registry.WINDOW_SIZE - len(registry.WINDOW_PINS)
    assert registry.DRIVER_WINDOW == registry.WINDOW_PINS + expected[:slots]


def test_window_is_deterministic():
    a = registry._build_driver_window(registry._driver_round())
    b = registry._build_driver_window(registry._driver_round())
    assert a == b == registry.DRIVER_WINDOW


def test_staleness_rotation_covers_entire_pool():
    """Simulate the driver landing one artifact per round: the rows in
    round r's window get last-checked=r, and the next round's window is
    rebuilt from that state. Every pool row must be (re-)checked within
    ceil(pool/slots) rounds of any starting point — the hard re-check
    bound the staleness priority guarantees regardless of debuts or tie
    groups."""
    pool = _pool()
    slots = registry.WINDOW_SIZE - len(registry.WINDOW_PINS)
    last = dict(registry._last_driver_checked())
    start_round = registry._driver_round()
    n_rounds = math.ceil(len(pool) / slots)
    covered = set()
    for r in range(start_round, start_round + n_rounds):
        window = sorted(pool, key=lambda n: (last.get(n, 0), n))[:slots]
        covered |= set(window)
        for name in window + registry.WINDOW_PINS:
            last[name] = r
    missing = sorted(set(pool) - covered)
    assert not missing, f"staleness rotation misses {missing[:5]}..."


def test_no_row_left_older_than_bound():
    """After the simulation reaches steady state, no row's staleness
    (current round minus last-checked) may exceed ceil(pool/slots)."""
    pool = _pool()
    slots = registry.WINDOW_SIZE - len(registry.WINDOW_PINS)
    bound = math.ceil(len(pool) / slots)
    last = dict(registry._last_driver_checked())
    start_round = registry._driver_round()
    # run well past the transient so the bound is the steady-state one
    for r in range(start_round, start_round + 3 * bound):
        window = sorted(pool, key=lambda n: (last.get(n, 0), n))[:slots]
        for name in window + registry.WINDOW_PINS:
            last[name] = r
    final_round = start_round + 3 * bound - 1
    worst = max(final_round - last.get(n, 0) for n in pool)
    assert worst < bound + 1, f"steady-state staleness {worst} > bound {bound}"


def test_registry_order_matches_window():
    first = list(registry.queries())[: registry.WINDOW_SIZE]
    assert first == registry.DRIVER_WINDOW


def test_window_matches_current_round_artifacts():
    # the round derives from the driver's own BENCH_r{N}.json files, so
    # the live window must equal the rebuilt one for that round
    assert registry.DRIVER_WINDOW == registry._build_driver_window(
        registry._driver_round()
    )
