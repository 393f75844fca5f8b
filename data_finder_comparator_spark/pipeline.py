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
from .sources.union import hadoop_ls, union_by_name


def read_folder(spark: SparkSession, folder: str) -> DataFrame:
    """S2/U1: read every parquet table in a folder and union by column
    name, null-filling columns missing from any file — the pandas
    concat semantics of /root/reference/main.py:690-696 without the
    driver-side loop. Listing via the shared Hadoop-FS helper
    (``sources.union.hadoop_ls``) — one listing path for the engine."""
    paths = hadoop_ls(spark, folder)
    if not paths:
        raise ValueError(f"no tables under {folder}")
    return union_by_name([spark.read.parquet(p) for p in paths])


def _prep_cands(data: DataFrame, cfg: EngineConfig) -> DataFrame:
    return with_row_ids(data, [cfg.data_key_col, *data.columns]).select(
        F.col("row_id").alias("cand_id"), F.col(cfg.data_key_col).alias("cand")
    )


def _curate(
    spark: SparkSession,
    search: DataFrame,
    cands: DataFrame,
    cfg: EngineConfig,
    cache_registry: list | None = None,
) -> DataFrame:
    """One find/compare/curate pass of a search table against a
    PREPARED candidate table (``_prep_cands`` output — prepared once by
    the caller so streaming mode doesn't redo it per micro-batch)."""
    # deterministic row identity for the probe side (P4 — Spark has no
    # positional rows; impose a total order on (key, payload order))
    search_ids = with_row_ids(search, [cfg.search_key_col, *search.columns])
    probes = search_ids.select(
        F.col("row_id").alias("probe_id"), F.col(cfg.search_key_col).alias("probe")
    )
    tiers = tiered_fuzzy_join(
        probes,
        cands,
        threshold=cfg.threshold,
        strategy=cfg.strategy,
        cache_registry=cache_registry,
    )
    decisions = curation_decisions(tiers)
    curated = apply_curation(search_ids, decisions, "row_id", cfg.search_key_col)
    if cfg.output_distances:
        # config.ini's output-distance flag (/root/reference/config.ini:6-8):
        # carry each probe's best match distance into the output
        best_d = (
            tiers.filter(F.col("tier").isin("best", "exact"))
            .groupBy("probe_id")
            .agg(F.min("dist").alias("match_dist"))
            .withColumnRenamed("probe_id", "row_id")
        )
        curated = curated.join(F.broadcast(best_d), "row_id", "left")
    return curated.drop("row_id")


def run_find_compare(
    spark: SparkSession, cfg: EngineConfig, upsert: bool = False
) -> DataFrame:
    """Execute the full find/compare/curate workflow per ``cfg`` and
    return the curated search table (written to ``cfg.output_path``
    when set). ``upsert=True`` uses the keyed-merge sink (Replace
    updates rows in place); otherwise rows append.

    ``cfg.streaming=True`` (the reference's multithreading pipeline,
    T1) processes the search path as a file stream instead: each
    micro-batch of probe files is curated against the static candidate
    table — prepared and persisted ONCE before the stream starts — and
    appended to the sink; requires ``cfg.output_path``. Row identity is
    per-batch in this mode. ``cfg.spark_conf`` entries are applied as
    runtime session confs for the duration of the run and restored
    afterwards."""
    prior_conf = {k: spark.conf.get(k, None) for k in cfg.spark_conf}
    for k, v in cfg.spark_conf.items():
        spark.conf.set(k, v)
    try:
        data = read_folder(spark, cfg.data_folder)
        cands = _prep_cands(data, cfg)

        if cfg.streaming:
            if not cfg.output_path:
                raise ValueError("streaming mode requires output_path (sink)")
            cands = cands.persist()  # static side: materialize once, reuse per batch
            schema = spark.read.parquet(cfg.search_path).schema
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)  # Queue(3)-style bounded in-flight
                .parquet(cfg.search_path)
            )

            def run_batch(batch_df: DataFrame, epoch_id: int) -> None:
                reg: list = []
                try:
                    append_sink(
                        _curate(spark, batch_df, cands, cfg, cache_registry=reg),
                        cfg.output_path,
                    )
                finally:
                    for cached in reg:
                        cached.unpersist()

            q = (
                stream.writeStream.foreachBatch(run_batch)
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination()
            finally:
                q.stop()
                cands.unpersist()
            return spark.read.parquet(cfg.output_path)

        search = spark.read.parquet(cfg.search_path)
        curated = _curate(spark, search, cands, cfg)
        if cfg.output_path:
            if cfg.output_path.endswith(".xlsx"):
                # the reference's own sink format (output.xlsx,
                # /root/reference/main.py:521-535): a driver-side
                # workbook write via the vendored codec — small curated
                # outputs only, exactly the reference's regime
                from .sources.excel import write_excel

                write_excel(curated, cfg.output_path)
            elif upsert:
                upsert_sink(curated, cfg.output_path, cfg.search_key_col)
            else:
                append_sink(curated, cfg.output_path)
        return curated
    finally:
        for k, prev in prior_conf.items():
            if prev is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, prev)
