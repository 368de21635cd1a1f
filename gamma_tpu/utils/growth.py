"""Buffer growth policy.

Pow2 doubling wastes up to 2x HBM on the largest arrays (a 10M-row corpus
would allocate 16.7M rows), and with copy-on-write updates the transient
peak doubles again.  Geometric growth with a 25% overshoot in fixed
quanta keeps the waste bounded while the persistent XLA compilation cache
absorbs the extra shape count.
"""


def grow_rows(cur: int, need: int, quantum: int = 8192) -> int:
    """Next capacity >= need: ceil to a quantum that is at least 1/4 of
    the current capacity (geometric-ish growth, ~25% headroom)."""
    if need <= cur:
        return cur
    step = max(quantum, cur // 4)
    return -(-need // step) * step
