"""North-rule check: the crawl runs via ``spark-submit --py-files`` on a
multi-executor master (local-cluster = real separate executor JVMs) and
still reproduces the golden simulator's exact ordering + URL-seen set.

This is the deployment path the reference replaces with a single JVM
(crawler/ContentCrawlCommand.java) — here the same job ships as a zip
to N executors and stays bit-identical.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_local_cluster(tmp_path):
    wd = str(tmp_path / "submit-wd")
    proc = subprocess.run(
        [
            "bash",
            os.path.join(ROOT, "tools", "submit.sh"),
            "local-cluster[2,2,1024]",
            wd,
            "300",
            "--budget",
            "500",
        ],
        capture_output=True,
        text=True,
        timeout=520,
        env={**os.environ, "PYSPARK_PYTHON": sys.executable},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = next(
        l for l in proc.stdout.splitlines() if l.startswith("CRAWLSPARK_SUBMIT_RESULT")
    )
    res = json.loads(line.split(" ", 1)[1])
    assert res["golden_order_match"] is True
    assert res["golden_seen_match"] is True
    assert res["rows_fetched"] > 0
    # really multi-executor: 2 executors x 2 cores
    assert res["executors"] == 4
    assert res["master"].startswith("local-cluster")
