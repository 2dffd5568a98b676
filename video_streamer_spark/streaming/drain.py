"""Loud-failure drain for ``Trigger.AvailableNow`` streams.

``StreamingQuery.awaitTermination(timeout)`` returns **False** on
timeout WITHOUT raising; a caller that ignores the return value can
come back while micro-batches are still committing and read a
partially-applied table — a nondeterministic wrong answer, not an
error. (Observed live: a CDC merge sink returned mid-commit under load
and a key's delete had not yet applied.) Every availableNow drain in
this repo goes through this helper so a timeout fails loudly instead.
"""

from __future__ import annotations


def drain_or_raise(q, timeout_sec: float, what: str = "stream") -> None:
    """Block until the availableNow query terminates; raise on timeout.

    On timeout the query is stopped first (so a leaked stream cannot
    keep mutating the sink behind the caller's back), then
    ``TimeoutError`` is raised. Exceptions raised BY the stream itself
    propagate from ``awaitTermination`` unchanged.
    """
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"{what}: stream did not drain in {timeout_sec}s; "
            "sink state is incomplete"
        )
