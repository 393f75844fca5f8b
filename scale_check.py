#!/usr/bin/env python
"""Scaling probe: run the scale-path operators on synthetically
inflated copies of the documents corpus (self-union with shifted ids —
same distribution, n times the rows) and print per-size timings as one
JSON line. The point is the growth CURVE, not the absolute numbers: an
operator whose time grows ~linearly in rows here has no hidden
quadratic pair-blowup, which is the property that decides survival at
100 TB.

Usage: python scale_check.py  [SPARK_GRAFT_SF_DIR=... for the base corpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from data_finder_comparator_spark.operators.dedup import (  # noqa: E402
    char_shingles,
    cluster_canonical,
    exact_canonical_map,
    lsh_candidate_pairs,
    minhash_lsh_bands,
    simhash32,
)
from data_finder_comparator_spark.operators.textops import (  # noqa: E402
    scrub_hot_spans,
)
from data_finder_comparator_spark.operators.fuzzy_join import (  # noqa: E402
    tiered_fuzzy_join,
    topk_fuzzy_join,
)
from data_finder_comparator_spark.plans.queries_text import (  # noqa: E402
    bucketed_packing_layout,
    bucketed_shuffle_positions,
    capped_per_group,
    doc_grams,
)
from data_finder_comparator_spark.session import get_spark  # noqa: E402
from data_finder_comparator_spark.sources.parquet import load_table  # noqa: E402


def _spill_totals(spark) -> tuple[int | None, int | None]:
    """(memoryBytesSpilled, diskBytesSpilled) summed over all completed
    stages, read from the live AppStatusStore (no UI/REST needed).
    Deltas around a probe attribute its spill.

    The probe reaches into Scala-synthesized default-arg accessors
    (``stageList$default$N``) via py4j — a private ABI that can change
    between Spark minor versions — so any failure degrades to
    (None, None) and the caller emits null spill columns instead of
    crashing the whole scale run."""
    try:
        sc = spark.sparkContext
        store = sc._jsc.sc().statusStore()
        empty = sc._jvm.java.util.ArrayList()  # all statuses
        mem = disk = 0
        # Scala default args don't exist at the JVM call site: py4j needs
        # the full arity, with each default fetched from its synthesized
        # ``stageList$default$N`` accessor
        defaults = [getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)]
        it = store.stageList(empty, *defaults).iterator()
        while it.hasNext():
            s = it.next()
            mem += s.memoryBytesSpilled()
            disk += s.diskBytesSpilled()
        return mem, disk
    except Exception:
        return None, None


def inflate(docs, times: int):
    """n copies with distinct doc_ids (same text distribution)."""
    out = None
    base = docs.agg(F.max("doc_id")).first()[0] + 1
    payload = [c for c in docs.columns if c != "doc_id"]
    for i in range(times):
        c = docs.select(
            (F.col("doc_id") + i * base).alias("doc_id"), *payload
        )
        out = c if out is None else out.unionByName(c)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # retainedStages default (1000) could evict baseline stages between
    # the two _spill_totals snapshots on a long multi-size run, which
    # would under-report (or negate) the spill delta — keep every stage
    spark = get_spark(
        app_name="scale-check",
        extra_conf={"spark.ui.retainedStages": "100000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "text",
        F.col("n_chars").cast("long").alias("n_chars"),
        "source",
        "lang",
    )
    sizes = [
        int(s)
        for s in os.environ.get("SPARK_GRAFT_SCALE_SIZES", "1,4,16,64,256").split(",")
    ]
    results: dict[str, dict[str, float]] = {}
    for times in sizes:
        # The adversarial/cross-join regimes are intentionally capped at
        # 16x: their cost is the measured intrinsic (documented in
        # SCALE.md §4/§6), and the 64x rung exists to decide the GROWTH
        # CURVE of the production paths (qgram fuzzy, LSH, the two-pass
        # shuffle/packing pattern). Past 64x (round 9) only the three
        # scale-critical plans run — minhash_lsh, fuzzy_qgram_dedup,
        # gram_tfidf — with spill columns: the x256 rung exists to show
        # sub-quadratic growth WITH attributed spill, not to re-time
        # every probe.
        heavy = times <= 16
        critical_only = times > 64
        docs = inflate(docs0, times).persist()
        n = docs.count()
        tag = f"x{times}"
        results[tag] = {"rows": n}

        ml_mem0, ml_disk0 = _spill_totals(spark)
        t0 = time.perf_counter()
        sh = char_shingles(docs, "doc_id", "text", k=5, distinct=False)
        n_direct = lsh_candidate_pairs(minhash_lsh_bands(sh, 12, 3)).count()
        results[tag]["minhash_lsh"] = round(time.perf_counter() - t0, 2)
        results[tag]["minhash_lsh_pairs"] = n_direct
        ml_mem1, ml_disk1 = _spill_totals(spark)
        ml_ok = None not in (ml_mem0, ml_disk0, ml_mem1, ml_disk1)
        results[tag]["minhash_lsh_spill_mem_mb"] = (
            round((ml_mem1 - ml_mem0) / 1e6, 1) if ml_ok else None
        )
        results[tag]["minhash_lsh_spill_disk_mb"] = (
            round((ml_disk1 - ml_disk0) / 1e6, 1) if ml_ok else None
        )
        spark.catalog.clearCache()

        # Sparse TF-IDF gram cosine top-k: the df cap is the scale
        # guarantee (posting-list fanout bounded at df_cap per gram) —
        # inflation drives every real gram's df over the cap, so the
        # probe exercises exactly the boilerplate-exclusion regime the
        # cap exists for.
        gt_mem0, gt_disk0 = _spill_totals(spark)
        t0 = time.perf_counter()
        from data_finder_comparator_spark.operators.textops import (
            gram_tfidf_cosine_topk,
        )

        gt_reg: list = []
        gram_tfidf_cosine_topk(
            docs, k=5, probe_mod=20, df_cap=32, cache_registry=gt_reg
        ).count()
        results[tag]["gram_tfidf"] = round(time.perf_counter() - t0, 2)
        gt_mem1, gt_disk1 = _spill_totals(spark)
        gt_ok = None not in (gt_mem0, gt_disk0, gt_mem1, gt_disk1)
        results[tag]["gram_tfidf_spill_mem_mb"] = (
            round((gt_mem1 - gt_mem0) / 1e6, 1) if gt_ok else None
        )
        results[tag]["gram_tfidf_spill_disk_mb"] = (
            round((gt_disk1 - gt_disk0) / 1e6, 1) if gt_ok else None
        )
        for frame in gt_reg:
            frame.unpersist()
        spark.catalog.clearCache()

        if critical_only:
            probes = docs.filter(F.col("doc_id") % 50 == 0).select(
                F.col("doc_id").alias("probe_id"),
                F.substring("text", 1, 24).alias("probe"),
            )
            cands = docs.select(
                F.col("doc_id").alias("cand_id"),
                F.substring("text", 1, 24).alias("cand"),
            )
            sd_mem0, sd_disk0 = _spill_totals(spark)
            t0 = time.perf_counter()
            tiered_fuzzy_join(
                probes, cands, threshold=5, strategy="qgram", dedup_strings=True
            ).count()
            results[tag]["fuzzy_qgram_dedup"] = round(time.perf_counter() - t0, 2)
            sd_mem1, sd_disk1 = _spill_totals(spark)
            sd_ok = None not in (sd_mem0, sd_disk0, sd_mem1, sd_disk1)
            results[tag]["fuzzy_qgram_dedup_spill_mem_mb"] = (
                round((sd_mem1 - sd_mem0) / 1e6, 1) if sd_ok else None
            )
            results[tag]["fuzzy_qgram_dedup_spill_disk_mb"] = (
                round((sd_disk1 - sd_disk0) / 1e6, 1) if sd_ok else None
            )
            spark.catalog.clearCache()
            docs.unpersist()
            continue

        # Production composition for duplicate-heavy corpora: exact
        # dedup FIRST (hash-groupBy on content md5), LSH over the
        # canonical representatives only, then expand the pair count
        # back through the class sizes with two scalar aggregations.
        # Identical texts share every band signature, so the expanded
        # pair set equals the direct LSH pair set EXACTLY (inter-class
        # pairs multiply by member counts; intra-class exact-dup pairs
        # are n*(n-1)/2 per class) — recorded in _pairs to prove it.
        t0 = time.perf_counter()
        # persisted: canon feeds reps + both expansion aggregations
        # across two actions — unpersisted it would recompute ~4x and
        # the recorded timing would overstate the composition's cost
        canon = exact_canonical_map(docs, "doc_id", "text").persist()
        reps = docs.join(
            canon.filter(F.col("doc_id") == F.col("canonical_id")).select("doc_id"),
            "doc_id",
        )
        bands_r = minhash_lsh_bands(
            char_shingles(reps, "doc_id", "text", k=5, distinct=False), 12, 3
        ).persist()
        rep_pairs = lsh_candidate_pairs(bands_r)
        # classes whose text yields no shingles (empty/short after
        # normalization) never enter the direct LSH either — exclude
        # them from the intra count or the equality claim would break
        # on corpora with degenerate texts
        sizes_tbl = (
            canon.groupBy("canonical_id")
            .agg(F.count(F.lit(1)).alias("_n"))
            .join(bands_r.select(F.col("doc_id").alias("canonical_id")).distinct(), "canonical_id")
            .persist()
        )
        inter = (
            rep_pairs.join(
                sizes_tbl.select(
                    F.col("canonical_id").alias("doc_a"), F.col("_n").alias("_na")
                ),
                "doc_a",
            )
            .join(
                sizes_tbl.select(
                    F.col("canonical_id").alias("doc_b"), F.col("_n").alias("_nb")
                ),
                "doc_b",
            )
            .agg(F.sum(F.col("_na") * F.col("_nb")))
            .first()[0]
        ) or 0
        # all-integer: sum n*(n-1) in long FIRST, halve with integer
        # div (the sum is always even) — double intermediates would
        # lose exactness past 2^53 total pairs and could spuriously
        # fail the equality-vs-direct-count claim
        intra = sizes_tbl.agg(
            F.expr("sum(_n * (_n - 1)) div 2").cast("long")
        ).first()[0] or 0
        results[tag]["minhash_lsh_collapsed"] = round(time.perf_counter() - t0, 2)
        results[tag]["minhash_lsh_collapsed_pairs"] = int(inter + intra)
        for df_ in (canon, bands_r, sizes_tbl):
            df_.unpersist()
        spark.catalog.clearCache()
        docs = inflate(docs0, times).persist()
        docs.count()  # warm the cache so simhash isn't billed for it

        t0 = time.perf_counter()
        simhash32(docs, "doc_id", "text").count()
        results[tag]["simhash"] = round(time.perf_counter() - t0, 2)

        # The bucketed two-pass global-position / running-sum pattern
        # (deterministic_shuffle + sequence_packing): the serial step
        # touches a fixed bucket histogram regardless of rows, so the
        # curve should be flat-to-linear with no global-sort blowup.
        t0 = time.perf_counter()
        bucketed_shuffle_positions(docs.select("doc_id")).count()
        results[tag]["shuffle_two_pass"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        bucketed_packing_layout(docs.select("doc_id", "n_chars")).count()
        results[tag]["packing_two_pass"] = round(time.perf_counter() - t0, 2)

        # Skew-split per-group cap: inflation multiplies every
        # (source, lang) group's size, so at 4x+ EVERY group is over
        # cap — the worst case for the split (the whole corpus enters
        # the ranking window). The curve must stay ~linear because the
        # window partitions by group, never globally.
        t0 = time.perf_counter()
        capped_per_group(docs, ["source", "lang"], F.md5("text"), 8).count()
        results[tag]["source_caps"] = round(time.perf_counter() - t0, 2)

        # Salted two-stage top-k over the cross-doc gram table: the
        # data-sized stage is a combinable agg + per-salt
        # WindowGroupLimit; only <=32*50 rows reach the single-task
        # final rank, so growth tracks the gram-count agg.
        t0 = time.perf_counter()
        # projected-token gram build (doc_grams form, round 7) — the
        # older inline triple-split was 2.7x slower; r7-and-earlier
        # span_topk rows measured the old form
        grams = doc_grams(docs, "doc_id")
        counted = (
            grams.groupBy("gram")
            .agg(
                F.count_distinct("doc_id").cast("long").alias("n_docs"),
                F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            )
            .filter(F.col("n_docs") >= 3)
        )
        order = [F.col("n_docs").desc(), F.col("n_occurrences").desc(), F.col("gram")]
        w_salt = Window.partitionBy("_salt").orderBy(*order)
        w_all = Window.orderBy(*order)
        (
            counted.withColumn("_salt", F.pmod(F.hash("gram"), F.lit(32)))
            .withColumn("_srk", F.row_number().over(w_salt))
            .filter(F.col("_srk") <= 50)
            .withColumn("rk", F.row_number().over(w_all))
            .filter(F.col("rk") <= 50)
            .count()
        )
        results[tag]["span_topk"] = round(time.perf_counter() - t0, 2)

        # Sketch builds (HLL registers / CMS counters): state is a fixed
        # 256 / 4096 cells regardless of rows, so the curve must track
        # the map-side scan alone — any superlinear growth means the
        # partial aggregation stopped combining before the exchange.
        t0 = time.perf_counter()
        v = F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("long")
        hb = docs.select(v.alias("v")).select(
            F.shiftright("v", 52).alias("register_id"),
            F.expr("v & 4503599627370495").alias("w"),
        )
        pos = F.instr(F.lpad(F.bin("w"), 52, "0"), "1")
        rho = F.when(pos == 0, F.lit(53)).otherwise(pos)
        hb.select("register_id", rho.alias("rho")).groupBy("register_id").agg(
            F.max("rho")
        ).count()
        results[tag]["hll_registers"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        toks = docs.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
        ).filter(F.col("tok") != "")
        freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
        cells = freq.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            (
                                F.conv(
                                    F.substring(
                                        F.md5(F.concat(F.lit(f"r{r}:"), F.col("tok"))),
                                        1,
                                        15,
                                    ),
                                    16,
                                    10,
                                ).cast("long")
                                % 1024
                            ).alias("b"),
                        )
                        for r in range(4)
                    ]
                )
            ).alias("cell"),
            "n",
        ).select("cell.r", "cell.b", "n")
        cells.groupBy("r", "b").agg(F.sum("n")).count()
        results[tag]["cms_counters"] = round(time.perf_counter() - t0, 2)

        # C4-style hot-span scrub (round-7 registration): the shapes to
        # watch are the span-gram explode fanout (token-count-sized) and
        # the per-doc anti-join + collect_list re-aggregation. Hot-gram
        # count grows with inflation (every gram trivially crosses the
        # >=3-doc bar once times >= 4), so covered-position volume ~
        # token volume — the curve should be linear in rows.
        sc_mem0, sc_disk0 = _spill_totals(spark)
        t0 = time.perf_counter()
        scrub_reg: list = []
        scrub_hot_spans(docs, min_docs=3, span=3, cache_registry=scrub_reg).count()
        results[tag]["scrub_spans"] = round(time.perf_counter() - t0, 2)
        sc_mem1, sc_disk1 = _spill_totals(spark)
        sc_ok = None not in (sc_mem0, sc_disk0, sc_mem1, sc_disk1)
        results[tag]["scrub_spans_spill_mem_mb"] = (
            round((sc_mem1 - sc_mem0) / 1e6, 1) if sc_ok else None
        )
        results[tag]["scrub_spans_spill_disk_mb"] = (
            round((sc_disk1 - sc_disk0) / 1e6, 1) if sc_ok else None
        )
        for frame in scrub_reg:
            frame.unpersist()

        # Cluster survivor selection (round-7 registration): labels are
        # synthesized as doc_id % base, which under inflate() puts the
        # `times` exact copies of each base doc into one cluster — so
        # cluster SIZE grows with the inflation factor, the giant-
        # cluster regime the max(struct) hash agg exists for (a window
        # formulation would buffer per-cluster partitions; the agg's
        # per-cluster state is one struct regardless of members).
        # base_mod is computed OUTSIDE the timed/spill window: it is a
        # separate Spark job over the base table, and timing it (or
        # attributing its stages' spill) would bias the probe's curve
        base_mod = docs0.agg(F.max("doc_id")).first()[0] + 1
        cc_mem0, cc_disk0 = _spill_totals(spark)
        t0 = time.perf_counter()
        labels = docs.select(
            "doc_id", (F.col("doc_id") % base_mod).alias("cluster_id")
        )
        cluster_canonical(labels, docs).count()
        results[tag]["cluster_canonical"] = round(time.perf_counter() - t0, 2)
        cc_mem1, cc_disk1 = _spill_totals(spark)
        cc_ok = None not in (cc_mem0, cc_disk0, cc_mem1, cc_disk1)
        results[tag]["cluster_canonical_spill_mem_mb"] = (
            round((cc_mem1 - cc_mem0) / 1e6, 1) if cc_ok else None
        )
        results[tag]["cluster_canonical_spill_disk_mb"] = (
            round((cc_disk1 - cc_disk0) / 1e6, 1) if cc_ok else None
        )

        sp_mem0, sp_disk0 = _spill_totals(spark)
        t0 = time.perf_counter()
        probes = docs.filter(F.col("doc_id") % 50 == 0).select(
            F.col("doc_id").alias("probe_id"),
            F.substring("text", 1, 24).alias("probe"),
        )
        cands = docs.select(
            F.col("doc_id").alias("cand_id"), F.substring("text", 1, 24).alias("cand")
        )
        tiered_fuzzy_join(probes, cands, threshold=5, strategy="qgram").count()
        results[tag]["fuzzy_qgram"] = round(time.perf_counter() - t0, 2)
        sp_mem1, sp_disk1 = _spill_totals(spark)
        spill_ok = None not in (sp_mem0, sp_disk0, sp_mem1, sp_disk1)
        results[tag]["fuzzy_qgram_spill_mem_mb"] = (
            round((sp_mem1 - sp_mem0) / 1e6, 1) if spill_ok else None
        )
        results[tag]["fuzzy_qgram_spill_disk_mb"] = (
            round((sp_disk1 - sp_disk0) / 1e6, 1) if spill_ok else None
        )
        spark.catalog.clearCache()

        # dedup_strings variant: candidate generation + DP once per
        # distinct string pair, expanded back by equi-joins — the
        # designed escape hatch for exactly this duplicate-heavy regime
        # (inflation factor d shrinks the gram join / pair-distinct /
        # DP passes by ~d^2). Measured against fuzzy_qgram above.
        sd_mem0, sd_disk0 = _spill_totals(spark)
        t0 = time.perf_counter()
        tiered_fuzzy_join(
            probes, cands, threshold=5, strategy="qgram", dedup_strings=True
        ).count()
        results[tag]["fuzzy_qgram_dedup"] = round(time.perf_counter() - t0, 2)
        sd_mem1, sd_disk1 = _spill_totals(spark)
        sd_ok = None not in (sd_mem0, sd_disk0, sd_mem1, sd_disk1)
        results[tag]["fuzzy_qgram_dedup_spill_mem_mb"] = (
            round((sd_mem1 - sd_mem0) / 1e6, 1) if sd_ok else None
        )
        results[tag]["fuzzy_qgram_dedup_spill_disk_mb"] = (
            round((sd_disk1 - sd_disk0) / 1e6, 1) if sd_ok else None
        )
        spark.catalog.clearCache()

        # dedup_strings="auto" (round 9): the duplication probe must
        # land within noise of the BETTER manual choice at every rung —
        # x1 decides whether the two probe aggregations are affordable,
        # x64 whether the probe correctly flips dedup on.
        t0 = time.perf_counter()
        tiered_fuzzy_join(
            probes, cands, threshold=5, strategy="qgram", dedup_strings="auto"
        ).count()
        results[tag]["fuzzy_qgram_auto"] = round(time.perf_counter() - t0, 2)
        spark.catalog.clearCache()

        # Adversarial all-fallback probe: a DISJOINT probe catalog (hex
        # keys vs text candidates) means every probe misses phase 1 and
        # resolves through the escalating band rescan — the regime that
        # was a |P|x|C| cartesian before round 2. Growth here should be
        # ~linear in candidate rows (each escalation round is a bucketed
        # equi-join), not quadratic.
        if heavy:
            t0 = time.perf_counter()
            adv = docs.filter(F.col("doc_id") % 50 == 0).select(
                F.col("doc_id").alias("probe_id"),
                F.substring(F.md5("text"), 1, 20).alias("probe"),
            )
            tiered_fuzzy_join(adv, cands, threshold=3, strategy="band").count()
            results[tag]["fuzzy_all_fallback"] = round(time.perf_counter() - t0, 2)
            spark.catalog.clearCache()

        # Escalating-band top-k vs the naive cross join it replaced:
        # both exact; the banded plan's work tracks band occupancy
        # (rows within edit-distance W of a probe length) while the
        # cross join is strictly |P|x|C| full DP. The curve — not the
        # 1x point, where multi-round job overhead dominates — is what
        # decides 100 TB.
        if heavy:
            t0 = time.perf_counter()
            topk_fuzzy_join(probes, cands, k=3, broadcast_cand=False).count()
            results[tag]["topk_banded"] = round(time.perf_counter() - t0, 2)
            spark.catalog.clearCache()

            t0 = time.perf_counter()
            from data_finder_comparator_spark.functions.normalize import norm_key

            p = probes.withColumn("_nq", norm_key(F.col("probe")))
            c = cands.withColumn("_nc", norm_key(F.col("cand")))
            w = Window.partitionBy("probe_id").orderBy("dist", "cand_id")
            (
                p.crossJoin(F.broadcast(c))
                .withColumn("dist", F.levenshtein("_nq", "_nc").cast("long"))
                .withColumn("rnk", F.rank().over(w))
                .filter(F.col("rnk") <= 3)
                .count()
            )
            results[tag]["topk_crossjoin"] = round(time.perf_counter() - t0, 2)
            spark.catalog.clearCache()
        docs.unpersist()

    print(json.dumps({"base_sf_dir": sf_dir, "sizes": results}))
    spark.stop()


if __name__ == "__main__":
    main()
