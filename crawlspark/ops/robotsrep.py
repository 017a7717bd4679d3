"""robots.txt REP matching (the Robots Exclusion Protocol as specified
by RFC 9309 / the Google REP reference semantics), generalizing the
engine's prefix-only deny rules (politeness.filter_robots; reference
analogue: the crawler honors per-source path restrictions):

* rules are (host, pattern, allow) with ``*`` matching any char
  sequence and a trailing ``$`` anchoring the end of the path;
* the MOST SPECIFIC matching rule wins — specificity = octet length of
  the original pattern (RFC 9309 §2.2.2);
* on a specificity tie, ALLOW wins (least-restrictive tie-break);
* a path matched by no rule is allowed.

Everything is plan-time compiled: each pattern becomes one anchored
regex literal shared verbatim by the Spark plan and the DuckDB oracle
(Java regex and DuckDB RE2 agree on the compiled subset: literals,
``.*``, ``$``). Matching is a broadcast join of the (tiny) rules dim
against the URL set, one regexp per (url, rule) pair, then a single
max(struct(specificity, allow)) hash-agg per URL — no UDFs, no window.

Scale: the rules dim is small by construction (robots files are
per-host and bounded); the join fan-out is |urls| x |rules_of_host|
and the agg is map-side combinable. At 10^10 URLs this is exactly the
shape of the engine's existing robots filter with a richer predicate.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F

from . import load

# ------------------------------------------------------------------
# pattern → anchored regex, shared verbatim by both engines
def compile_rep(pattern: str) -> str:
    """REP pattern → anchored regex literal. ``*`` → ``.*``; a trailing
    ``$`` anchors the end; every other char is matched literally."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "^" + re.escape(body).replace(r"\*", ".*")
    return rx + "$" if anchored else rx


# the gate's deterministic rule set (host h1..h6 as in schedops):
# exercises longest-match precedence, re-allow of a subtree, wildcard
# + end-anchor, an exact specificity tie (allow wins), and a
# host-specific rule (odd hosts also disallow /priv*)
_COMMON_RULES = [
    ("/cal*", False),  # disallow the calendar trap space...
    ("/cal/pub/*", True),  # ...but re-allow its public subtree (longer)
    ("/*.tmp$", False),  # no temp files (wildcard + end anchor)
    ("/tie/x*", True),  # specificity tie with the next rule:
    ("/tie/x$", False),  # same octet length -> ALLOW wins on /tie/x
]
_ODD_RULES = [("/priv*", False)]


def rep_rules_pdf(n_hosts: int = 6) -> pd.DataFrame:
    rows = []
    for i in range(1, n_hosts + 1):
        host = f"h{i}.example.com"
        rules = _COMMON_RULES + (_ODD_RULES if i % 2 == 1 else [])
        for pat, allow in rules:
            rows.append(
                {
                    "host": host,
                    "pattern": pat,
                    "rx": compile_rep(pat),
                    "spec": len(pat),
                    "allow": allow,
                }
            )
    return pd.DataFrame(rows)


def rep_allowed(urls, rules):
    """(url, host, path) x rules dim → allowed flag per URL.

    Winner = max(struct(spec, allow)) over matching rules: specificity
    first, and since False < True the allow bit breaks exact ties
    upward — the RFC's least-restrictive tie-break for free. No match
    → allowed (left join keeps the URL with a null winner)."""
    matched = urls.join(F.broadcast(rules), "host").filter(
        F.expr("_path rlike rx")
    )
    winner = matched.groupBy("url").agg(
        F.max(F.struct(F.col("spec"), F.col("allow"))).alias("w")
    )
    return urls.join(winner, "url", "left").select(
        urls["*"],
        F.coalesce(F.col("w.allow"), F.lit(True)).alias("allowed"),
    )


# ------------------------------------------------------------------
# gate: deterministic URL set cycling through the interesting paths —
# /cal/... (disallowed), /cal/pub/... (re-allowed by the longer rule),
# /doc/N.tmp (end-anchored disallow), /doc/N.tmpl (NOT matched by the
# anchor → allowed), /tie/x (exact specificity tie → allow wins),
# /priv/N (disallowed on odd hosts only)
def robots_rep_filter(spark, sf):
    d = load(spark, sf, "documents")
    i = F.col("doc_id").cast("string")
    k = F.col("doc_id") % 6
    path = (
        F.when(k == 0, F.concat(F.lit("/cal/2024/"), i))
        .when(k == 1, F.concat(F.lit("/cal/pub/"), i))
        .when(k == 2, F.concat(F.lit("/doc/"), i, F.lit(".tmp")))
        .when(k == 3, F.concat(F.lit("/doc/"), i, F.lit(".tmpl")))
        .when(k == 4, F.lit("/tie/x"))
        .otherwise(F.concat(F.lit("/priv/"), i))
    )
    urls = d.select(
        "doc_id",
        F.concat(
            F.lit("h"), (1 + F.col("doc_id") % 6).cast("string"), F.lit(".example.com")
        ).alias("host"),
        path.alias("_path"),
    ).withColumn("url", F.concat(F.lit("https://"), "host", "_path"))
    rules = urls.sparkSession.createDataFrame(rep_rules_pdf(6))
    return rep_allowed(urls, rules).select(
        "doc_id", "host", F.col("_path").alias("path"), "allowed"
    )


def _rules_values_sql() -> str:
    rows = ", ".join(
        f"('{r.host}', '{r.rx}', {r.spec}, {str(bool(r.allow)).upper()})"
        for r in rep_rules_pdf(6).itertuples()
    )
    return f"(VALUES {rows}) AS rules(host, rx, spec, allow)"


_PATH_CASE = """
CASE doc_id % 6
  WHEN 0 THEN concat('/cal/2024/', doc_id::VARCHAR)
  WHEN 1 THEN concat('/cal/pub/', doc_id::VARCHAR)
  WHEN 2 THEN concat('/doc/', doc_id::VARCHAR, '.tmp')
  WHEN 3 THEN concat('/doc/', doc_id::VARCHAR, '.tmpl')
  WHEN 4 THEN '/tie/x'
  ELSE concat('/priv/', doc_id::VARCHAR)
END
"""

ROBOTS_REP_SQL = f"""
WITH u AS (
  SELECT doc_id,
         concat('h', (1 + doc_id % 6)::VARCHAR, '.example.com') AS host,
         {_PATH_CASE} AS path
  FROM documents
),
winner AS (
  SELECT doc_id, allow FROM (
    SELECT u.doc_id, rules.allow,
           row_number() OVER (
             PARTITION BY u.doc_id
             ORDER BY rules.spec DESC, rules.allow DESC
           ) AS rn
    FROM u JOIN {_rules_values_sql()} ON u.host = rules.host
    WHERE regexp_matches(u.path, rules.rx)
  ) WHERE rn = 1
)
SELECT u.doc_id, u.host, u.path, coalesce(w.allow, TRUE) AS allowed
FROM u LEFT JOIN winner w ON u.doc_id = w.doc_id
"""


QUERIES = {"robots_rep_filter": robots_rep_filter}
ORACLES = {"robots_rep_filter": ROBOTS_REP_SQL}
