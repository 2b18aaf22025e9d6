"""Probe: where does web_curation_pipeline's 14 s go?

Times (a) builder call = plan construction incl. the lazy
localCheckpoints, (b) first execution (count), for three variants:
  current  — lazy localCheckpoint between layers (shipping code)
  eager    — eager localCheckpoint between layers
  parquet  — fixtures materialized once to parquet, layers plan over scans
Run: python tools/webcure_wall_probe.py [sf_dir]
"""
from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .appName("webcure-wall-probe")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from spk_sl_validation_spark.ext import webcure as W  # noqa: E402
from spk_sl_validation_spark.plans.webcure_queries import (  # noqa: E402
    BLOCKED_DOMAINS,
    DOMAIN_CAP_K,
    _urls,
)


def run(tag, build):
    t0 = time.perf_counter()
    df = build()
    t1 = time.perf_counter()
    n = df.count()
    t2 = time.perf_counter()
    print(f"{tag:10s} build={t1-t0:7.3f}s exec={t2-t1:7.3f}s rows={n}")


def build_current():
    urls = _urls(spark, sf_dir)
    robots = W.synthesize_robots_table(urls)
    blocked = spark.createDataFrame([(d,) for d in BLOCKED_DOMAINS], "domain string")
    kept = W.robots_txt_filter(urls, robots).localCheckpoint(eager=False)
    kept = W.blocklist_filter(kept, blocked).localCheckpoint(eager=False)
    kept = W.url_dedup(kept).localCheckpoint(eager=False)
    kept = W.domain_cap(kept, DOMAIN_CAP_K)
    nu = W.normalize_url("url")
    return kept.select("doc_id", nu.alias("norm_url"), W.extract_domain(nu).alias("domain"))


def build_eager():
    urls = _urls(spark, sf_dir)
    robots = W.synthesize_robots_table(urls)
    blocked = spark.createDataFrame([(d,) for d in BLOCKED_DOMAINS], "domain string")
    kept = W.robots_txt_filter(urls, robots).localCheckpoint(eager=True)
    kept = W.blocklist_filter(kept, blocked).localCheckpoint(eager=True)
    kept = W.url_dedup(kept).localCheckpoint(eager=True)
    kept = W.domain_cap(kept, DOMAIN_CAP_K)
    nu = W.normalize_url("url")
    return kept.select("doc_id", nu.alias("norm_url"), W.extract_domain(nu).alias("domain"))


def build_nochk():
    urls = _urls(spark, sf_dir)
    robots = W.synthesize_robots_table(urls)
    blocked = spark.createDataFrame([(d,) for d in BLOCKED_DOMAINS], "domain string")
    kept = W.robots_txt_filter(urls, robots)
    kept = W.blocklist_filter(kept, blocked)
    kept = W.url_dedup(kept)
    kept = W.domain_cap(kept, DOMAIN_CAP_K)
    nu = W.normalize_url("url")
    return kept.select("doc_id", nu.alias("norm_url"), W.extract_domain(nu).alias("domain"))


import tempfile, os  # noqa: E402

tmp = tempfile.mkdtemp(prefix="webcure_probe_")


def build_parquet():
    urls_p = os.path.join(tmp, "urls")
    robots_p = os.path.join(tmp, "robots")
    urls0 = _urls(spark, sf_dir)
    urls0.write.mode("overwrite").parquet(urls_p)
    W.synthesize_robots_table(urls0).write.mode("overwrite").parquet(robots_p)
    urls = spark.read.parquet(urls_p)
    robots = spark.read.parquet(robots_p)
    blocked = spark.createDataFrame([(d,) for d in BLOCKED_DOMAINS], "domain string")
    kept = W.robots_txt_filter(urls, robots)
    kept = W.blocklist_filter(kept, blocked)
    kept = W.url_dedup(kept)
    kept = W.domain_cap(kept, DOMAIN_CAP_K)
    nu = W.normalize_url("url")
    return kept.select("doc_id", nu.alias("norm_url"), W.extract_domain(nu).alias("domain"))


# interleave two rounds to see warm-JVM effects
for rnd in (1, 2):
    print(f"--- round {rnd} ---")
    run("current", build_current)
    run("eager", build_eager)
    run("nochk", build_nochk)
    run("parquet", build_parquet)
spark.stop()
