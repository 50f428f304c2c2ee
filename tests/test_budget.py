"""The driver-budget ordering is computed, not hand-curated: the head of
``queries()`` must match the evidence-allocation policy applied to the
recorded CORRECTNESS artifacts (VERDICT r5 "Next round" item 6)."""

from pathlib import Path

from squirtle_spark import budget, registry

REPO = Path(__file__).resolve().parent.parent


def test_budget_order_policy_unit():
    names = ["a", "b", "c", "d", "e", "f"]
    hist = {"a": 4, "c": 2, "e": 3}  # b, d, f never checked
    order = budget.budget_order(names, hist, pin_head=["e"], pin_tail=["f"])
    # pin first; never-checked (registration order); oldest-evidence; pin last
    assert order == ["e", "b", "d", "c", "a", "f"]
    assert sorted(order) == sorted(names)


def test_registry_order_matches_ledger():
    qs = registry.load_all()
    names = list(qs)
    hist = budget.evidence_history(REPO)
    expected = budget.budget_order(
        list(registry.QUERIES),
        hist,
        pin_head=registry._PIN_HEAD,
        pin_tail=registry._PIN_TAIL,
        current_round=max(hist.values(), default=0) + 1,
    )
    # load_all pins the order on first call; QUERIES insertion order is
    # identical across processes (module imports are deterministic), so
    # the recomputation must agree exactly.
    assert names == expected
    assert len(names) == len(set(names)) == len(registry.QUERIES)


def test_never_checked_entries_head_the_budget():
    qs = registry.load_all()
    head = set(list(qs)[:50])
    hist = budget.evidence_history(REPO)
    never = [n for n in qs if n not in hist and n not in registry._PIN_TAIL]
    # every never-driver-checked entry must sit inside the 50-entry budget
    # (if this ever exceeds 50 the policy still front-loads them; the
    # assertion then flags that additions outpaced the budget)
    assert len(never) <= 50, "more never-checked entries than budget slots"
    missing = [n for n in never if n not in head]
    assert not missing, f"never-checked entries outside the budget: {missing}"


def test_pin_tail_refresh_takes_one_slot_when_stale():
    """VERDICT r13 #6: a pin-tail entry >= TAIL_REFRESH_STALENESS rounds
    without a driver row takes exactly ONE budget slot (the last), oldest
    first; fresh pin-tails spend nothing."""
    names = [f"q{i:02d}" for i in range(60)] + ["t_a", "t_b"]
    hist = {n: 10 for n in names}
    hist["t_a"], hist["t_b"] = 3, 4  # both stale at round 14

    order = budget.budget_order(
        names, hist, pin_tail=["t_a", "t_b"], current_round=14
    )
    # exactly one promoted, the stalest, into the last budget slot
    assert order[budget.BUDGET - 1] == "t_a"
    assert order.index("t_b") >= budget.BUDGET
    assert sorted(order) == sorted(names)

    # fresh pin-tails stay out of the window entirely
    hist["t_a"], hist["t_b"] = 12, 13
    order = budget.budget_order(
        names, hist, pin_tail=["t_a", "t_b"], current_round=14
    )
    assert order.index("t_a") >= budget.BUDGET
    assert order.index("t_b") >= budget.BUDGET

    # no current_round (legacy callers): behavior unchanged, tails last
    order = budget.budget_order(names, hist, pin_tail=["t_a", "t_b"])
    assert order[-2:] == ["t_a", "t_b"]
