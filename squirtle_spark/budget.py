"""Driver-budget ordering derived from recorded correctness history.

The driver walks ``__spark_entry__.queries()`` in insertion order and
spends its 50-entry per-round check budget on the head, so iteration
order IS evidence allocation. Rounds 2–5 allocated it with hand-written
``_PROMOTE`` / ``_DEFER`` ledgers in the registry — ~250 lines of prose
that had to be re-derived every round (VERDICT r5 "Next round" item 6
asked for exactly this automation). This module computes the same policy
mechanically from the ``CORRECTNESS_r*.json`` artifacts the driver
itself writes:

1. ``pin_head`` entries first — the round's explicit evidence choices
   (kept deliberately short; pins are for judgment calls, not bookkeeping);
2. then every entry that has NEVER had a driver row, in registration
   order — a first independent check always outranks a re-check;
3. then checked entries, OLDEST evidence first — rotation, so no entry
   coasts forever on an early-round row;
4. ``pin_tail`` entries last — rows-only-by-nature entries whose driver
   row can only prove rows>0 (their real evidence is pytest error-bound
   contracts); they must not displace an oracle-bearing re-check.

Every deferred entry keeps its full pytest DuckDB oracle regardless of
order — ``tests/test_oracle.py`` sweeps the whole registry every run.
"""

from __future__ import annotations

import json
from pathlib import Path


def evidence_history(repo_root: str | Path | None = None) -> dict[str, int]:
    """Latest round in which each entry name had a driver correctness row.

    Presence of a key in ``CORRECTNESS_rNN.json`` is what counts — the
    driver writes a row per checked entry whether it passed or not, and
    a red row is still evidence the budget was spent there (the failure
    gets fixed and the entry re-checked via the rotation rule anyway).
    """
    if repo_root:
        roots = [Path(repo_root)]
    else:
        # package location first (the repo layout), falling back to the
        # working directory: an INSTALLED package's __file__ lands in
        # site-packages where the glob silently matches nothing and the
        # budget would degrade to registration order with no signal
        roots = [Path(__file__).resolve().parent.parent, Path.cwd()]
    root = next((r for r in roots if any(r.glob("CORRECTNESS_r*.json"))), roots[0])
    latest: dict[str, int] = {}
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(f.stem.split("_r")[1])
            rows = json.loads(f.read_text())
        except (ValueError, IndexError, json.JSONDecodeError):
            continue
        for name in rows:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


#: Driver budget size (the driver truncates queries() after this many).
BUDGET = 50
#: A pin-tail entry whose last driver row is at least this many rounds
#: old takes ONE budget slot this round (VERDICT r13 #6): pin-tail rows
#: can only prove rows>0, so they must never displace an oracle-bearing
#: re-check in the steady state — but a decade of rounds without ANY
#: driver row leaves no independent confirmation that the engine-native
#: path still runs under the driver harness. One slot per round, oldest
#: first, only while stale: cheap insurance, bounded displacement.
TAIL_REFRESH_STALENESS = 5


def budget_order(
    names: list[str],
    history: dict[str, int],
    pin_head: list[str] = (),
    pin_tail: list[str] = (),
    current_round: int | None = None,
) -> list[str]:
    """Order ``names`` per the evidence-allocation policy (see module doc).

    Sorting is stable on registration order within each class, so the
    result is deterministic for a fixed registry + artifact set. With
    ``current_round`` given, the stalest pin-tail entry ≥
    TAIL_REFRESH_STALENESS rounds old is promoted into the LAST budget
    slot (one per round — see TAIL_REFRESH_STALENESS).
    """
    reg_pos = {n: i for i, n in enumerate(names)}
    # dedup pins (order-preserving): a repeated pin would otherwise emit
    # the name twice and the result would stop being a permutation
    head = list(dict.fromkeys(n for n in pin_head if n in reg_pos))
    tail = [
        n
        for n in dict.fromkeys(pin_tail)
        if n in reg_pos and n not in head
    ]
    rest = [n for n in names if n not in head and n not in tail]
    # never-checked → round 0, which sorts before every real round
    rest.sort(key=lambda n: (history.get(n, 0), reg_pos[n]))
    order = head + rest + tail
    if current_round is not None:
        stale = [
            n
            for n in tail
            if current_round - history.get(n, 0) >= TAIL_REFRESH_STALENESS
        ]
        if stale:
            pick = min(stale, key=lambda n: (history.get(n, 0), reg_pos[n]))
            order.remove(pick)
            order.insert(min(BUDGET - 1, len(order)), pick)
    return order
