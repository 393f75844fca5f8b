"""Deterministic distributed k-means (Lloyd) — IVF centroid training.

`operators/similarity.ivf_topk` routes queries through sampled
centroids (its docstring: "a production system would k-means"). This
is that trainer: a fixed number of Lloyd rounds with deterministic
seeds (the k lowest vec_ids) and deterministic tie-breaks (argmin by
(dist², centroid id)), so the result is exactly reproducible and
oracle-checkable — unlike MLlib KMeans, whose random init/parallel
reductions give run-to-run drift. MLlib remains the production answer
when reproducibility-to-the-bit is not a requirement; the shuffle
shape here is the same one it uses (assign via broadcast centroids,
update via per-dimension partial aggregation).

Arithmetic discipline: every cross-engine-compared sum accumulates in
DECIMAL, because double addition is non-associative and Spark's
partial aggregation visits rows in a different order than a
sequential engine — with decimals the sums are exact and
order-independent, so Spark's own retries/partitioning can never
change the result either (same rule as the decimal sums in
queries_relational).

Data layout: vectors arrive flattened as (vec_id, dim, val) — one row
per dimension. The explode costs ×dims rows, but both phases then
become plain hash aggregations: distance = broadcast-join the k×dims
centroid table on `dim` (map-side, no shuffle) + partial-agg
sum((val-cval)²) per (vec, centroid); update = partial-agg decimal
sums per (centroid, dim). Nothing is ever collected to the driver;
centroids stay a k×dims DataFrame end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DIST_DEC = "decimal(38,18)"
_SUM_DEC = "decimal(28,12)"


def flatten_vectors(vecs: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, array<float>) -> (vec_id, dim, val double), dim 1-based."""
    return vecs.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.posexplode(vec_col).alias("pos", "val"),
    ).select(
        "vec_id", (F.col("pos") + 1).alias("dim"), F.col("val").cast("double").alias("val")
    )


def kmeans_lloyd(
    vdim: DataFrame,
    k: int,
    iterations: int = 2,
    cache_registry: list | None = None,
) -> DataFrame:
    """Run ``iterations`` Lloyd rounds over flattened vectors.

    Seeds: the k smallest vec_ids' vectors. Assignment: argmin of
    exact-decimal squared L2, ties to the lower centroid id. Update:
    elementwise mean as exact decimal sum / count. A centroid that
    captures no vectors drops out (standard Lloyd behavior; k shrinks).

    Returns (cluster_id, dim, centroid_val double, n_vectors long) —
    k×dims rows.
    """
    if cache_registry is not None:
        vdim = vdim.persist()
        cache_registry.append(vdim)

    seed_ids = vdim.select("vec_id").distinct().orderBy("vec_id").limit(k)
    cent = (
        vdim.join(F.broadcast(seed_ids), "vec_id")
        .select(
            F.col("vec_id").alias("cluster_id"),
            "dim",
            F.col("val").alias("cval"),
            F.lit(1).cast("long").alias("n_vectors"),
        )
    )

    # argmin via row_number window, NOT min(struct(...)): struct min
    # has no hash-aggregate implementation (Catalyst plans it as a
    # SortAggregate), so the window — whole-stage-codegen'd sort within
    # hash-partitioned vec_id groups — is the faster argmin here.
    w = Window.partitionBy("vec_id").orderBy("dist2", "cluster_id")
    for i in range(iterations):
        sq = (F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval"))
        dist = (
            vdim.join(F.broadcast(cent.select("cluster_id", "dim", "cval")), "dim")
            .groupBy("vec_id", "cluster_id")
            .agg(F.sum(sq.cast(_DIST_DEC)).alias("dist2"))
        )
        assign = (
            dist.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("vec_id", "cluster_id")
        )
        cent = (
            # assign is |V| rows of two longs — tiny at harness scale, so
            # AQE picks a broadcast join from the observed size and the
            # (x dims bigger) flattened side never shuffles; the only
            # exchange per round is the (cluster_id, dim) partial agg.
            # Deliberately NO explicit broadcast() hint: Spark honors a
            # user hint unconditionally, so at 100 TB (|V| past the 8 GB
            # broadcast cap) a hinted plan hard-fails instead of falling
            # back — size-based planning degrades to the shuffled hash
            # join on vec_id that MLlib pays, which is what you want.
            vdim.join(assign, "vec_id")
            .groupBy("cluster_id", "dim")
            .agg(
                (
                    F.sum(F.col("val").cast(_SUM_DEC)).cast("double")
                    / F.count(F.lit(1))
                ).alias("cval"),
                F.count(F.lit(1)).cast("long").alias("n_vectors"),
            )
        )
        # Truncate lineage every SECOND round: each round's plan embeds
        # the prior one's (assign -> dist -> prior cent), so unbounded
        # depth hits the Catalyst-analysis blow-up connected_components
        # documents — but an eager k×dims materialization per round is
        # pure latency. Capping embedded depth at 2 rounds keeps
        # analysis O(1) per checkpoint at half the materializations; the
        # final round never checkpoints (the caller's action
        # materializes it anyway).
        if (i + 1) % 2 == 0 and (i + 1) < iterations:
            cent = cent.localCheckpoint()
    return cent.select(
        "cluster_id", "dim", F.col("cval").alias("centroid_val"), "n_vectors"
    )
