"""End-to-end workflow test: the reference's main() flow (SURVEY.md
§3.1) run as one composed pipeline over reference-shaped fixtures
(FIXTURES.md A1/A2) — folder union, fuzzy join, keep/replace curation,
sink — including the Replace-as-upsert variant."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_finder_comparator_spark.config import EngineConfig
from data_finder_comparator_spark.pipeline import read_folder, run_find_compare


def _write_fixtures(spark, tmp_path):
    search = spark.createDataFrame(
        [
            ("CH-S09FTXD-BL/SC", 0.1, 10.0),   # exact after normalization
            ("cold widgetx", 0.2, 20.0),        # unique best -> replace
            ("mmmmmmmmmmmm", 0.3, 30.0),        # poor only -> keep
        ],
        "sku string, discount double, price double",
    )
    search_path = str(tmp_path / "search")
    search.write.parquet(search_path)
    folder = tmp_path / "catalog"
    folder.mkdir()
    spark.createDataFrame(
        [("ch s09 ftxd-blsc", 1.0)], "sku string, stock double"
    ).write.parquet(str(folder / "f0"))
    # second file: overlapping-but-different schema (union-by-name)
    spark.createDataFrame(
        [("cold widget", "EU")], "sku string, region string"
    ).write.parquet(str(folder / "f1"))
    return search_path, str(folder)


def test_run_find_compare_end_to_end(spark, tmp_path):
    search_path, folder = _write_fixtures(spark, tmp_path)
    cfg = EngineConfig(
        search_path=search_path,
        data_folder=folder,
        output_path=str(tmp_path / "out"),
        threshold=3,
    )
    curated = run_find_compare(spark, cfg)
    got = {r.sku: (r.discount, r.price) for r in curated.collect()}
    # exact match kept unchanged; unique best replaced; poor kept
    assert got == {
        "CH-S09FTXD-BL/SC": (0.1, 10.0),
        "cold widget": (0.2, 20.0),
        "mmmmmmmmmmmm": (0.3, 30.0),
    }
    sink = spark.read.parquet(cfg.output_path)
    assert sink.count() == 3

    # second run with upsert: prices change, keys dedupe in the sink
    spark.createDataFrame(
        [("cold widgetx", 0.2, 99.0)], "sku string, discount double, price double"
    ).write.mode("overwrite").parquet(search_path)
    run_find_compare(spark, cfg, upsert=True)
    merged = {r.sku: r.price for r in spark.read.parquet(cfg.output_path).collect()}
    assert merged["cold widget"] == 99.0  # replaced row upserted
    assert merged["CH-S09FTXD-BL/SC"] == 10.0  # untouched rows survive


def test_streaming_mode_and_distances(spark, tmp_path):
    """cfg.streaming=True processes probe files as micro-batches into
    the sink; cfg.output_distances adds the best match distance."""
    search_path, folder = _write_fixtures(spark, tmp_path)
    cfg = EngineConfig(
        search_path=search_path,
        data_folder=folder,
        output_path=str(tmp_path / "stream_out"),
        threshold=3,
        streaming=True,
        output_distances=True,
    )
    out = run_find_compare(spark, cfg)
    rows = {r.sku: r.match_dist for r in out.collect()}
    assert rows["CH-S09FTXD-BL/SC"] == 0  # exact
    assert rows["cold widget"] == 1  # replaced at distance 1
    assert rows["mmmmmmmmmmmm"] is None  # poor only -> no best/exact dist

    # streaming without a sink is a config error
    import pytest as _pytest

    with _pytest.raises(ValueError):
        run_find_compare(
            spark,
            EngineConfig(search_path=search_path, data_folder=folder, streaming=True),
        )


def test_read_folder_union_null_fills(spark, tmp_path):
    _, folder = _write_fixtures(spark, tmp_path)
    df = read_folder(spark, folder)
    assert set(df.columns) == {"sku", "stock", "region"}
    rows = {r.sku: (r.stock, r.region) for r in df.collect()}
    assert rows["ch s09 ftxd-blsc"] == (1.0, None)
    assert rows["cold widget"] == (None, "EU")


def test_run_find_compare_xlsx_sink(spark, tmp_path):
    """An .xlsx output_path routes the curated table through the
    vendored workbook writer — the reference's own sink format
    (output.xlsx) — and reads back identical rows."""
    from data_finder_comparator_spark.sources.excel import read_excel

    search_path, folder = _write_fixtures(spark, tmp_path)
    cfg = EngineConfig(
        search_path=search_path,
        data_folder=folder,
        output_path=str(tmp_path / "output.xlsx"),
        threshold=3,
    )
    curated = run_find_compare(spark, cfg)
    back = read_excel(spark, cfg.output_path)
    assert sorted(map(tuple, back.collect()), key=repr) == sorted(
        map(tuple, curated.collect()), key=repr
    )
