"""URL canonicalization — pure built-in Spark SQL expressions (no UDF).

Generalizes the reference's asset-URL path surgery
(contentful/backup/ContentfulBackup.java:215-224) into a full
canonicalizer: lowercase scheme+host, strip fragment, drop default
ports, sort query parameters, normalize empty path to '/'.

Three bit-identical implementations: Spark Column (engine), Python
(golden simulator), DuckDB SQL (driver oracle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonicalize(url: Column | str) -> Column:
    """Canonicalize a URL column using only JVM-side built-ins.

    A value with no '://' separator passes through unchanged (fragment
    still stripped) — same contract as :func:`py_canonicalize`; the
    scheme is whatever precedes the FIRST '://' (not a charset-valid
    scheme), again matching the Python mirror on adversarial input."""
    u = F.col(url) if isinstance(url, str) else url
    no_frag = F.substring_index(u, "#", 1)
    pos = F.instr(no_frag, "://")
    scheme = F.lower(F.substring_index(no_frag, "://", 1))
    after = F.substring(no_frag, pos + 3, 1 << 30)
    authority = F.lower(F.regexp_extract(after, r"^([^/?]*)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(authority, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(authority, ":443$", ""))
        .otherwise(authority)
    )
    path_q = F.substring(after, F.length(authority) + 1, 1 << 30)
    path = F.substring_index(path_q, "?", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qpos = F.instr(path_q, "?")
    query = F.when(qpos > 0, F.substring(path_q, qpos + 1, 1 << 30)).otherwise(F.lit(""))
    sorted_query = F.array_join(F.array_sort(F.split(query, "&")), "&")
    out = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(sorted_query != "", F.concat(F.lit("?"), sorted_query)).otherwise(F.lit("")),
    )
    return F.when(pos > 0, out).otherwise(no_frag)


def py_canonicalize(url: str) -> str:
    """Python mirror of :func:`canonicalize` — must match bit-for-bit."""
    no_frag = url.split("#", 1)[0]
    if "://" not in no_frag:
        return no_frag
    scheme, after = no_frag.split("://", 1)
    scheme = scheme.lower()
    end = len(after)
    for ch in "/?":
        p = after.find(ch)
        if p != -1:
            end = min(end, p)
    authority = after[:end].lower()
    host = authority
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    path_q = after[end:]
    qpos = path_q.find("?")
    if qpos >= 0:
        path, query = path_q[:qpos], path_q[qpos + 1 :]
    else:
        path, query = path_q, ""
    if path == "":
        path = "/"
    sorted_query = "&".join(sorted(query.split("&"))) if query != "" else ""
    out = f"{scheme}://{host}{path}"
    if sorted_query:
        out += "?" + sorted_query
    return out


def canonicalize_duckdb_sql(expr: str) -> str:
    """DuckDB SQL text computing the same canonical form (driver oracle).

    Splits at the FIRST '://' and passes schemeless values through
    unchanged (fragment still stripped) — bit-identical to
    :func:`py_canonicalize` on adversarial input, not just on the
    well-formed URLs the synthetic generators emit."""
    no_frag = f"str_split({expr}, '#')[1]"
    scheme = f"lower(substring({no_frag}, 1, instr({no_frag}, '://') - 1))"
    after = f"substring({no_frag}, instr({no_frag}, '://') + 3)"
    authority = f"lower(regexp_extract({after}, '^([^/?]*)', 1))"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({authority}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({authority}, ':443$', '') "
        f"ELSE {authority} END"
    )
    path_q = f"substring({after}, length({authority}) + 1)"
    path0 = f"CASE WHEN instr({path_q}, '?') > 0 THEN substring({path_q}, 1, instr({path_q}, '?') - 1) ELSE {path_q} END"
    path = f"CASE WHEN {path0} = '' THEN '/' ELSE {path0} END"
    query = f"CASE WHEN instr({path_q}, '?') > 0 THEN substring({path_q}, instr({path_q}, '?') + 1) ELSE '' END"
    sorted_q = f"array_to_string(list_sort(str_split({query}, '&')), '&')"
    return (
        f"CASE WHEN instr({no_frag}, '://') > 0 THEN "
        f"concat({scheme}, '://', {host}, {path}, "
        f"CASE WHEN {query} <> '' THEN concat('?', {sorted_q}) ELSE '' END) "
        f"ELSE {no_frag} END"
    )
