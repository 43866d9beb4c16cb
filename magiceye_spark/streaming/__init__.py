"""Structured Streaming operators: schema-drift monitoring over snapshot
streams and watermarked windowed event rollups."""

from __future__ import annotations


def drain(query, timeout_sec: float) -> None:
    """``awaitTermination`` with a LOUD timeout.

    ``StreamingQuery.awaitTermination(t)`` returns ``False`` on timeout
    instead of raising, so a hung drain silently records ``t`` seconds as
    a bench seat's wall clock (and the still-running query then contends
    with the next seat's stream, surfacing as a confusing downstream
    failure). Every bounded drain in the repo — bench seats and streaming
    tests — goes through here: on timeout the query is stopped (so it
    cannot pollute later work) and a ``TimeoutError`` names the query.
    """
    if not query.awaitTermination(timeout_sec):
        name = query.name or query.id
        try:
            query.stop()
        finally:
            raise TimeoutError(
                f"streaming query {name} did not terminate within "
                f"{timeout_sec}s (stopped to avoid polluting later work)"
            )
