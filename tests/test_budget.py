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
    expected = budget.budget_order(
        list(registry.QUERIES),
        budget.evidence_history(REPO),
        pin_head=registry._PIN_HEAD,
        pin_tail=registry._PIN_TAIL,
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
