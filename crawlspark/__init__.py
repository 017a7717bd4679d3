"""crawlspark — a PySpark-native URL-frontier + fetch-scheduler engine.

A from-scratch re-expression of the capabilities of gbif/content-crawler
(reference at /root/reference, Java: RxJava pagers -> handlers -> ES bulk
sinks) as an idiomatic Spark DataFrame engine:

* crawl round  = one DataFrame job (frontier scan -> URL-seen anti-join ->
  robots filter -> per-host politeness window rank -> vectorized fetch ->
  atomic append), generalizing the reference's page loop
  (mendeley/MendeleyDocumentCrawler.java:59-122).
* URL-seen     = exact dedup table + bloom/cuckoo pre-filter, generalizing
  skip-if-exists (contentful/backup/ContentfulBackup.java:180-182).
* politeness   = per-host budget via salted window ranking, generalizing
  rate limiting (contentful/backup/ContentfulRestore.java:46) and page
  limits (conf/ContentCrawlConfiguration.java:87).
* checkpoints  = atomic per-round snapshot commits with per-partition
  lineage, generalizing the nextUrl marker (mendeley/MendeleyPager.java:87-99).

All data-path logic is built-in Spark SQL expressions or Arrow-vectorized
pandas UDFs — no per-row Python.
"""

__version__ = "0.1.0"
