"""Deterministic synthetic crawl fixtures (FIXTURES.md §2-§5).

Re-expresses the reference's operational fixture — a seed URL + page
size producing an exact page sequence and final count (README.md:28-50)
— as data: a Zipfian-host seed list, per-host robots + politeness
rules, and an injected-fault model mirroring the 504-retry semantics of
mendeley/MendeleyDocumentCrawler.java:72-87.

The seed list is generated once (numpy, fixed seed) and consumed as
data by both the Spark engine and the golden simulator, so float math
in generation cannot cause divergence. Everything computed DURING the
crawl (fault status, outlink expansion, priorities) uses only
integer md5 arithmetic that Spark SQL and Python evaluate identically
(see hashing.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from .hashing import py_h60


@dataclass(frozen=True)
class SynthConfig:
    n_seeds: int = 1000
    n_hosts: int = 20
    zipf_s: float = 1.1
    max_depth: int = 2
    max_retries: int = 3  # conf/ContentCrawlConfiguration.java:92 (3 retries)
    # rounds of extra delay per prior attempt: not_before = r + 1 +
    # step*rc (the reference's retryCount x httpTimeout linear backoff,
    # conf/ContentCrawlConfiguration.java:92-93, with httpTimeout
    # expressed in rounds; 0 = retry next round)
    retry_backoff_step: int = 1
    url_space: int = 0  # id space for outlink targets; 0 → 4 * n_seeds
    seed: int = 42
    # disable the injected-504 fault model (every fetch succeeds).
    # Used by the steady-state throughput bench: a FINITE workload with
    # faults drains through tiny retry-only rounds whose fixed per-round
    # latency is identical at every cluster size (a pure Amdahl term a
    # CONTINUOUS crawl never pays — in steady state retries ride inside
    # full-volume rounds). Golden/engine equivalence holds either way.
    fault_free: bool = False
    # content volatility for adaptive-recrawl runs: when set, a
    # deterministic third of URLs (h60(url|vol) % 3 == 0) serve NEW
    # content every p(url) = 1 + h60(url|per) % change_period rounds
    # (codec key becomes h60(base_url|v<version>)); the other two
    # thirds stay bit-identical forever. None (default) = today's
    # fully static corpus — every existing golden/test is unaffected.
    change_period: int | None = None
    # transient 429 throttling: when > 0, a deterministic
    # throttle_permille/1000 fraction of (url, round) pairs return 429
    # with Retry-After = 1 + h60(url|ra) % 3 rounds. The URL re-enters
    # the frontier at not_before = round + Retry-After WITHOUT
    # consuming a retry (it never reached the server's handler) and is
    # NOT marked seen. The coin is per-(url, round), so a throttled URL
    # eventually gets through. Precedence: 301 > 404 > 429 > fault.
    throttle_permille: int = 0
    # permanent 404s: when > 0, a deterministic gone_permille/1000
    # fraction of URLs (h60(url|gone) % 1000) return 404 — a PERMANENT
    # client error: no body, no retry (unlike the transient-504 fault
    # model), the URL is marked seen immediately. Redirect wins when
    # the coins overlap (the server answers 301 before routing).
    gone_permille: int = 0
    # HTTP 3xx redirect model: when > 0, a deterministic
    # redirect_permille/1000 fraction of URLs (h60(url|redir) % 1000)
    # return 301 with a synthetic Location target instead of a body.
    # Redirects take precedence over the 504 fault model (a real 3xx
    # response IS a successful HTTP exchange). 0 (default) keeps every
    # existing golden/test byte-identical.
    redirect_permille: int = 0
    # chain cap: a target reached through this many redirect hops is
    # fetched, but if IT redirects again its Location is dropped (the
    # reference's HTTP client follows at most a fixed number of hops;
    # the engine follows them ACROSS rounds, so the cap rides the
    # frontier's per-row hop counter)
    max_redirect_hops: int = 5

    @property
    def target_space(self) -> int:
        return self.url_space or 4 * self.n_seeds


def host_name(i: int) -> str:
    return f"h{i}.example.com"


def target_url(dst_host: str, k: int) -> str:
    """THE synthetic target-URL shape — single source of truth shared by
    outlink expansion and redirect Locations (Python side; the Spark
    mirror is fetch._target_url_col)."""
    return f"https://{dst_host}/img/{k}?p={k % 13}&s={k % 7}"


def budget_for_hostid(i: int) -> int:
    """Per-host politeness budget per round: hot hosts get more budget
    but still bind under Zipf skew (FIXTURES.md §4)."""
    if i <= 2:
        return 50
    if i <= 30:
        return 5
    return 2


def robots_denied(host: str) -> bool:
    """~1 in 8 hosts disallow the /img/priv prefix."""
    return py_h60(host + "|robots") % 8 == 0


def gen_seeds(cfg: SynthConfig) -> pd.DataFrame:
    """Seed URL list: Zipfian host skew, ~1% exact duplicates, ~2%
    fragment/query-order variants (canonicalization tests), ~3% under
    the /img/priv robots-sensitive prefix."""
    rng = np.random.Generator(np.random.Philox(cfg.seed))
    n, H = cfg.n_seeds, cfg.n_hosts
    # Zipf over 1..H: fold the unbounded zipf tail back onto 1..H
    # (clipping would pile the entire tail mass on host H, inverting
    # the skew — folding keeps host 1 hottest)
    ranks = (rng.zipf(cfg.zipf_s, size=n) - 1) % H + 1
    ks = rng.integers(0, cfg.target_space, size=n)
    priv = rng.random(n) < 0.03
    variant = rng.integers(0, 100, size=n)
    urls = []
    for i in range(n):
        host = host_name(int(ranks[i]))
        path = "img/priv" if priv[i] else "img"
        k = int(ks[i])
        if variant[i] < 2:  # query-order + fragment variant
            urls.append(f"https://{host}/{path}/{k}?p={k % 13}&s={k % 7}#frag{i}")
        else:
            urls.append(f"https://{host}/{path}/{k}?s={k % 7}&p={k % 13}")
    # ~1% exact duplicates of earlier seeds
    ndup = max(1, n // 100)
    dup_idx = rng.integers(0, n, size=ndup)
    urls.extend(urls[j] for j in dup_idx)
    return pd.DataFrame({"url": urls, "depth": np.zeros(len(urls), dtype=np.int32)})


def gen_robots(cfg: SynthConfig) -> pd.DataFrame:
    rows = [
        {"host": host_name(i), "path_prefix": "/img/priv"}
        for i in range(1, cfg.n_hosts + 1)
        if robots_denied(host_name(i))
    ]
    return pd.DataFrame(rows, columns=["host", "path_prefix"])


def gen_politeness(cfg: SynthConfig) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "host": [host_name(i) for i in range(1, cfg.n_hosts + 1)],
            "budget": [budget_for_hostid(i) for i in range(1, cfg.n_hosts + 1)],
        }
    )


# ---------------------------------------------------------------------
# Pure-function crawl dynamics, Python side. hashing.py guarantees the
# Spark SQL expressions in engine.py compute the same integers.
# ---------------------------------------------------------------------
def py_fail_times(url: str) -> int:
    """Injected 504s: ~2% of URLs fail 1-3 times then succeed; 0.1%
    fail 4 times (exceeds max_retries=3 → permanent-failure path)."""
    h = py_h60(url + "|fault")
    pm = h % 1000
    if pm == 0:
        return 4
    if pm < 20:
        return 1 + (h >> 8) % 3
    return 0


def py_status(url: str, retry_count: int) -> int:
    return 504 if retry_count < py_fail_times(url) else 200


def py_priority(url: str) -> float:
    return (py_h60(url + "|prio") % 1_000_000) / 1_000_000.0


def py_is_redirect(url: str, cfg: SynthConfig) -> bool:
    """Whether this URL 301s (pure hash coin, precedence over faults)."""
    return (
        cfg.redirect_permille > 0
        and py_h60(url + "|redir") % 1000 < cfg.redirect_permille
    )


def py_is_throttled(url: str, round_id: int, cfg: SynthConfig) -> bool:
    """Whether this (url, round) attempt gets a 429 (transient coin —
    later rounds re-flip, so throttled URLs eventually pass)."""
    return (
        cfg.throttle_permille > 0
        and py_h60(f"{url}|thr{round_id}") % 1000 < cfg.throttle_permille
    )


def py_retry_after(url: str) -> int:
    """Retry-After header value in rounds (1-3), a pure URL hash."""
    return 1 + py_h60(url + "|ra") % 3


def py_is_gone(url: str, cfg: SynthConfig) -> bool:
    """Whether this URL 404s permanently (pure hash coin; redirect
    takes precedence when both coins hit)."""
    return (
        cfg.gone_permille > 0 and py_h60(url + "|gone") % 1000 < cfg.gone_permille
    )


def py_redirect_target(url: str, cfg: SynthConfig) -> str:
    """Deterministic Location header for a 301 URL: same-host biased
    (50/50), target id in the same space as outlinks — so a target can
    itself be a redirect, producing multi-hop chains."""
    host = url.split("://", 1)[1].split("/", 1)[0]
    if py_h60(url + "|rh") % 10 < 5:
        dst_host = host
    else:
        dst_host = host_name(1 + py_h60(url + "|rd") % cfg.n_hosts)
    k = py_h60(url + "|rt") % cfg.target_space
    return target_url(dst_host, k)


def py_outlinks(url: str, depth: int, cfg: SynthConfig) -> list[str]:
    """0-3 outlinks per fetched page, same-host biased, bounded depth."""
    if depth >= cfg.max_depth:
        return []
    host = url.split("://", 1)[1].split("/", 1)[0]
    n = py_h60(url + "|links") % 4
    out = []
    for i in range(n):
        if py_h60(url + f"|l{i}") % 10 < 8:
            dst_host = host
        else:
            dst_host = host_name(1 + py_h60(url + f"|h{i}") % cfg.n_hosts)
        k = py_h60(url + f"|t{i}") % cfg.target_space
        out.append(target_url(dst_host, k))
    return out
