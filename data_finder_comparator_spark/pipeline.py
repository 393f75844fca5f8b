"""The reference's end-to-end workflow as one composed, deterministic
pipeline (SURVEY.md §3.1 — /root/reference/main.py:556-592 and its
setup at :688-704):

  load search table → folder-scan + union candidates → tiered fuzzy
  join → keep/replace decisions → point-update the key column → sink.

The GUI verdict loop (main.py:563-581) is replaced by the deterministic
policy in ``curation_decisions`` (SURVEY.md §3.4), the O(n²)
re-read-per-append xlsx sink by parquet append / keyed upsert, and the
two-thread bounded-queue pipeline (main.py:501-518) by Spark's own
pipelined execution (or the streaming wrapper in streaming/pipeline.py
when probes arrive as a live feed).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import EngineConfig
from .operators.curation import (
    append_sink,
    apply_curation,
    curation_decisions,
    upsert_sink,
    with_row_ids,
)
from .operators.fuzzy_join import tiered_fuzzy_join
from .sources.union import union_by_name


def read_folder(spark: SparkSession, folder: str) -> DataFrame:
    """S2/U1: read every parquet table in a folder and union by column
    name, null-filling columns missing from any file — the pandas
    concat semantics of /root/reference/main.py:690-696 without the
    driver-side loop."""
    paths = sorted(
        os.path.join(folder, f)
        for f in os.listdir(folder)
        if not f.startswith(("_", "."))
    )
    return union_by_name([spark.read.parquet(p) for p in paths])


def run_find_compare(
    spark: SparkSession, cfg: EngineConfig, upsert: bool = False
) -> DataFrame:
    """Execute the full find/compare/curate workflow per ``cfg`` and
    return the curated search table (written to ``cfg.output_path``
    when set). ``upsert=True`` uses the keyed-merge sink (Replace
    updates rows in place); otherwise rows append."""
    search = spark.read.parquet(cfg.search_path)
    data = read_folder(spark, cfg.data_folder)

    # deterministic row identity for the probe side (P4 — Spark has no
    # positional rows; impose a total order on (key, payload order))
    search_ids = with_row_ids(search, [cfg.search_key_col, *search.columns])
    probes = search_ids.select(
        F.col("row_id").alias("probe_id"), F.col(cfg.search_key_col).alias("probe")
    )
    cands = with_row_ids(data, [cfg.data_key_col, *data.columns]).select(
        F.col("row_id").alias("cand_id"), F.col(cfg.data_key_col).alias("cand")
    )

    tiers = tiered_fuzzy_join(
        probes, cands, threshold=cfg.threshold, strategy=cfg.strategy
    )
    decisions = curation_decisions(tiers)
    curated = apply_curation(
        search_ids, decisions, "row_id", cfg.search_key_col
    ).drop("row_id")

    if cfg.output_path:
        if upsert:
            upsert_sink(curated, cfg.output_path, cfg.search_key_col)
        else:
            append_sink(curated, cfg.output_path)
    return curated
