"""Golden single-threaded reference simulator (FIXTURES.md §8).

Replays the reference's crawl loop semantics — lazy pager (S1/S2),
priority order (O1), per-host politeness budget (O2/T3), 504 retries
with linear backoff (T2), skip-if-seen dedup (F9/A5) — as a plain
Python loop, independent of Spark. The engine's output must match this
EXACTLY at every parallelism level (north_rule: "reproduce the exact
crawl ordering and final URL-seen set").

Reference loop shape being simulated: mendeley/MendeleyDocumentCrawler
.java:59-122 (page → retry → handle), generalized from one pager to a
per-host prioritized frontier.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

from .canon import py_canonicalize
from .hashing import py_h60
from .synth import (
    SynthConfig,
    budget_for_hostid,
    py_is_gone,
    py_is_redirect,
    py_is_throttled,
    py_outlinks,
    py_priority,
    py_redirect_target,
    py_retry_after,
    py_status,
    robots_denied,
)

ROBOTS_DENIED_STATUS = -1
PERM_FAIL_STATUS = -504
REDIRECT_STATUS = 301
GONE_STATUS = 404
THROTTLED_STATUS = 429


def _host_of(url: str) -> str:
    return url.split("://", 1)[1].split("/", 1)[0]


def _enqueue(frontier: dict, cu: str, nb: int, dep: int, hp: int) -> None:
    """Order-independent frontier merge for a new arrival (outlink or
    redirect target): pending retries win; otherwise keep the
    lexicographic min of (not_before, depth, hops) — the same lattice
    the engine's _reduce_per_url computes distributively."""
    if cu in frontier:
        rc0, nb0, dep0, hp0 = frontier[cu]
        if rc0 == 0:
            nb1, dep1, hp1 = min((nb0, dep0, hp0), (nb, dep, hp))
            frontier[cu] = (0, nb1, dep1, hp1)
    else:
        frontier[cu] = (0, nb, dep, hp)


def _hostid(host: str) -> int:
    return int(host.split(".", 1)[0][1:])


@dataclass
class GoldenResult:
    fetch_order: pd.DataFrame  # round_id, host, rank, url, status, retry_count
    url_seen: pd.DataFrame  # url, url_hash, status, round_id
    n_rounds: int


def simulate(
    seeds: list[str],
    cfg: SynthConfig,
    max_rounds: int = 1000,
    budget_fn=None,
    min_delay_fn=None,
    robots_rep_fn=None,
    adaptive_budget=None,
    priority_aging=None,
    sitemap_fn=None,
    max_pages_fn=None,
) -> GoldenResult:
    """``min_delay_fn(hostid) -> d`` (optional): a host selected in
    round r is untouched (no robots marking, no budget) until round
    r + d — the T3 rate-limit generalized to a per-host cool-down.

    ``robots_rep_fn(hostid) -> [(rx, spec, allow), ...]`` (optional):
    full REP rules replacing the default prefix deny model — the
    winner is the most specific matching rule (max (spec, allow):
    allow breaks exact ties, RFC 9309), no match → allowed. ``rx`` is
    the compiled regex from ops/robotsrep.compile_rep, evaluated here
    with re.search — the same anchored-prefix semantics as the
    engine's rlike.

    ``adaptive_budget=(min_b, max_b)`` (optional): AIMD per-host
    budgets — after each round, a host that returned any 504 halves
    its budget (floor min_b); an all-success host ramps +1 (cap
    max_b). Budgets start at budget_fn's value.

    ``priority_aging=alpha`` (optional): rank by priority + alpha *
    rounds-ripe (r - not_before) — the engine's starvation-freedom
    order, same IEEE double arithmetic.

    ``sitemap_fn(hostid) -> [url, ...] | None`` (optional): the host's
    robots-advertised sitemap. The FIRST round a host is selected, its
    entries (canonicalized, not already seen) join the frontier
    eligible from the next round — depth 0, hops 0, the engine's
    sitemap-discovery semantics exactly.

    ``max_pages_fn(hostid) -> int | None`` (optional): cumulative
    per-host page quota. Selection budget is capped at max_pages minus
    status-200 bodies fetched so far (robots denials, 3xx/404/429/504
    consume no quota; recrawl refetches do). Exhausted hosts' pending
    rows stay pending forever — matching the engine, which leaves them
    resumable under a raised quota."""
    import re as _re
    budget_fn = budget_fn or (lambda hostid: budget_for_hostid(hostid))
    host_last: dict[str, int] = {}
    host_budget: dict[str, int] = {}
    host_pages: dict[str, int] = {}
    contacted: set[str] = set()
    # frontier entries: url -> (retry_count, not_before, depth, hops)
    # hops = redirect-chain length that led here (0 for seeds/outlinks)
    frontier: dict[str, tuple[int, int, int, int]] = {}
    for u in seeds:
        cu = py_canonicalize(u)
        if cu not in frontier:
            frontier[cu] = (0, 0, 0, 0)
    seen: dict[str, tuple[int, int]] = {}  # url -> (status, round)
    log_rows = []
    r = 0
    while r < max_rounds:
        pending = [
            (u, rc, dep, hp, nb)
            for u, (rc, nb, dep, hp) in frontier.items()
            if nb <= r and u not in seen
        ]
        if not pending:
            # future retries may exist
            future = [u for u in frontier if u not in seen]
            if not future:
                break
            r += 1
            continue
        # robots filter: denied URLs are recorded as seen, consume no budget
        ready = []
        for u, rc, dep, hp, nb in pending:
            host = _host_of(u)
            if min_delay_fn is not None:
                d = min_delay_fn(_hostid(host))
                if d > 1 and host in host_last and host_last[host] + d > r:
                    continue  # cooling: rows untouched this round
            path = "/" + u.split("://", 1)[1].split("/", 1)[1]
            if robots_rep_fn is not None:
                best = None
                for rx, spec, allow in robots_rep_fn(_hostid(host)):
                    if _re.search(rx, path):
                        k = (spec, allow)
                        if best is None or k > best:
                            best = k
                denied = best is not None and not best[1]
            else:
                denied = robots_denied(host) and path.startswith("/img/priv")
            if denied:
                seen[u] = (ROBOTS_DENIED_STATUS, r)
                del frontier[u]
            else:
                ready.append((u, rc, dep, hp, nb, host))
        # per-host politeness: top-budget by (priority desc, url asc),
        # with the optional aging term raising long-ripe URLs
        by_host: dict[str, list] = {}
        for u, rc, dep, hp, nb, host in ready:
            by_host.setdefault(host, []).append((u, rc, dep, hp, nb))
        selected = []
        for host, rows in by_host.items():
            budget = host_budget.get(host, budget_fn(_hostid(host)))
            if max_pages_fn is not None:
                mp = max_pages_fn(_hostid(host))
                if mp is not None:
                    budget = min(budget, max(0, mp - host_pages.get(host, 0)))
            if priority_aging:
                rows.sort(
                    key=lambda t: (
                        -(py_priority(t[0]) + priority_aging * (r - t[4])),
                        t[0],
                    )
                )
            else:
                rows.sort(key=lambda t: (-py_priority(t[0]), t[0]))
            for rank, (u, rc, dep, hp, nb) in enumerate(rows[:budget], start=1):
                selected.append((host, rank, u, rc, dep, hp))
        for sel in selected:
            host_last[sel[0]] = r
        # fetch
        round_bad: dict[str, bool] = {}
        for host, rank, u, rc, dep, hp in selected:
            if py_is_redirect(u, cfg):
                status = REDIRECT_STATUS
            elif py_is_gone(u, cfg):
                status = GONE_STATUS
            elif py_is_throttled(u, r, cfg):
                status = THROTTLED_STATUS
            else:
                status = 200 if cfg.fault_free else py_status(u, rc)
            round_bad[host] = round_bad.get(host, False) or status in (504, 429)
            log_rows.append(
                {
                    "round_id": r,
                    "host": host,
                    "rank": rank,
                    "url": u,
                    "status": status,
                    "retry_count": rc,
                }
            )
            if status == THROTTLED_STATUS:
                # server back-pressure: honor Retry-After — the row
                # re-enters the frontier unchanged (no retry consumed,
                # not seen), eligible again at r + Retry-After
                frontier[u] = (rc, r + py_retry_after(u), dep, hp)
            elif status == GONE_STATUS:
                # permanent client error: resolved, no body, NO retry
                seen[u] = (GONE_STATUS, r)
                del frontier[u]
            elif status == REDIRECT_STATUS:
                # 301: the URL is resolved (seen, never refetched); its
                # Location re-enters the frontier with hops+1 — unless
                # the chain cap is reached or the target is already
                # seen (which also terminates redirect loops).
                seen[u] = (REDIRECT_STATUS, r)
                del frontier[u]
                if hp < cfg.max_redirect_hops:
                    cu = py_canonicalize(py_redirect_target(u, cfg))
                    if cu not in seen:
                        _enqueue(frontier, cu, r + 1, dep, hp + 1)
            elif status == 200:
                seen[u] = (200, r)
                del frontier[u]
                host_pages[host] = host_pages.get(host, 0) + 1
                for raw in py_outlinks(u, dep, cfg):
                    cu = py_canonicalize(raw)
                    if cu in seen:
                        continue
                    _enqueue(frontier, cu, r + 1, dep + 1, 0)
            else:  # 504
                nrc = rc + 1
                if nrc > cfg.max_retries:
                    seen[u] = (PERM_FAIL_STATUS, r)
                    del frontier[u]
                else:
                    # linear backoff in rounds (T2: retry# × delay)
                    nb = r + 1 + cfg.retry_backoff_step * (nrc - 1)
                    frontier[u] = (nrc, nb, dep, hp)
        if adaptive_budget:
            mn_b, mx_b = adaptive_budget
            for host, bad in round_bad.items():
                cur = host_budget.get(host, budget_fn(_hostid(host)))
                host_budget[host] = (
                    max(mn_b, cur // 2) if bad else min(mx_b, cur + 1)
                )
        if sitemap_fn is not None:
            # first-contact sitemap discovery: entries of hosts selected
            # for the first time this round enter the frontier eligible
            # from r+1 (skipping anything already seen, including this
            # round's resolutions — the engine's anti-join pair)
            for host in {s[0] for s in selected}:
                if host in contacted:
                    continue
                contacted.add(host)
                for raw in sitemap_fn(_hostid(host)) or []:
                    cu = py_canonicalize(raw)
                    if cu not in seen:
                        _enqueue(frontier, cu, r + 1, 0, 0)
        if max_pages_fn is not None and not selected:
            # every remaining row on a quota-exhausted host is dead
            # forever; stop once nothing else can ever be selected
            # (matches the engine's future-round scheduling, which
            # stops rescheduling once a round selects nothing)
            def _alive(u: str) -> bool:
                h = _host_of(u)
                mp = max_pages_fn(_hostid(h))
                return mp is None or mp - host_pages.get(h, 0) > 0

            if not any(_alive(u) for u in frontier if u not in seen):
                break
        r += 1
    order = pd.DataFrame(
        log_rows,
        columns=["round_id", "host", "rank", "url", "status", "retry_count"],
    )
    seen_df = pd.DataFrame(
        [
            {"url": u, "url_hash": py_h60(u), "status": s, "round_id": rr}
            for u, (s, rr) in seen.items()
        ],
        columns=["url", "url_hash", "status", "round_id"],
    )
    return GoldenResult(fetch_order=order, url_seen=seen_df, n_rounds=r)
