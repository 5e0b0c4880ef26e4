"""Pure-Python re-implementation of the reference crawl-admission loop
(queue_manager.py:34-57 + crawler_service.py:119-167) used as the
end-to-end oracle (SURVEY.md §5.3).

Admission order is the reference's FIFO ``queue.put`` order, which is
independent of its worker batching: pages are dequeued FIFO and each
page's links are enqueued in extraction order, so the admitted sequence is
exactly BFS first-wins order. (The reference's *result list* order is
async-completion order and nondeterministic — SURVEY.md §7.4.2 — so the
admission order is the contract we test.)
"""

from __future__ import annotations

from collections import deque


def simulate_crawl(
    seeds: list[str],
    links_of,
    max_depth: int,
    max_pages: int | None = None,
) -> list[tuple[str, int]]:
    """Returns admitted (url, depth) in admission (enqueue_seq) order."""
    order: list[tuple[str, int]] = []
    seen: set[str] = set()
    queue: deque[tuple[str, int]] = deque()

    def add(url: str, depth: int) -> None:
        if (
            url not in seen
            and depth <= max_depth
            and (max_pages is None or len(seen) < max_pages)
        ):
            seen.add(url)
            order.append((url, depth))
            queue.append((url, depth))

    for s in seeds:
        add(s, 0)
    while queue:
        url, depth = queue.popleft()
        if depth < max_depth:
            for v in links_of(url):
                add(v, depth + 1)
    return order
