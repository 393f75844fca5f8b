"""Deduplication operators for large-scale document corpora.

The reference has no dedup surface (its nearest analogue is the
set-difference at /root/reference/main.py:219); these are the
training-data-pipeline extensions (BASELINE.json north star), built as
compositions of DataFrame ops so they scale: everything is
groupBy/join/explode on hashed keys — no driver-side state, no Python
in the hot path.

Design notes for 100 TB:

* Shingling explodes each document into k-grams — output is ~|text|
  rows per doc, but immediately reduced by distinct + min-hash
  aggregation, so the shuffle carries (doc, seed) signatures, not raw
  shingles. At cluster scale, repartition by doc_id before exploding to
  bound per-task memory.
* MinHash-LSH turns near-dup search from O(n²) pairs into an equi-join
  on (band, signature) — only colliding buckets produce pairs. Band
  count / rows-per-band trade recall vs candidate volume.
* The MinHash family is Kirsch-Mitzenmacher double hashing over one
  md5 per shingle (two 48-bit hex halves; seed s hashes to
  h1 + s*h2 mod 2^48) — engine-portable integers, so the DuckDB oracle
  computes bit-identical signatures. A production variant would swap
  md5 for xxhash64; md5 keeps the oracle exact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import norm_key
from ..partitioning import fanout_partitions as _fanout_partitions


def char_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, distinct: bool = True
) -> DataFrame:
    """Character k-grams of the normalized text: (doc_id, shingle).
    Documents shorter than k yield no rows.

    ``distinct=True`` dedups per-doc shingles (a full shuffle) — needed
    when downstream counts set sizes (Jaccard). Min-style consumers
    (MinHash) pass ``distinct=False``: duplicate shingles can't change a
    min, and skipping the shuffle leaves the explode fully pipelined
    into the signature aggregation."""
    grams = (
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            norm_key(F.col(text_col)).alias("_n"),
        )
        .filter(F.length("_n") >= k)
        # document tables arrive in few large file-splits; the explode
        # inflates each row ~|text|-fold, so spread docs across the
        # cluster BEFORE inflating (a shuffle of doc-count rows buys
        # full parallelism for the k*|text| shingle work). The count is
        # explicit: AQE would coalesce a size-based repartition of the
        # small pre-explode input back to one partition
        .repartition(_fanout_partitions(df), F.col("doc_id"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(_n) - {k - 1}),"
                    f" i -> substring(_n, i, {k}))"
                )
            ).alias("shingle"),
        )
    )
    return grams.distinct() if distinct else grams


MINHASH_MOD = 1 << 48  # 48-bit hash space: exact in BIGINT for h1 + 11*h2


def _minhash_wide(shingles: DataFrame, n_hashes: int) -> DataFrame:
    """One wide row per doc: m0..m{n-1} minhash columns from a single
    md5 per shingle (Kirsch-Mitzenmacher double hashing)."""
    h = F.md5(F.col("shingle"))
    halves = shingles.select(
        "doc_id",
        F.conv(F.substring(h, 1, 12), 16, 10).cast("long").alias("_h1"),
        F.conv(F.substring(h, 13, 12), 16, 10).cast("long").alias("_h2"),
    )
    mins = [
        F.min((F.col("_h1") + s * F.col("_h2")) % MINHASH_MOD).alias(f"m{s}")
        for s in range(n_hashes)
    ]
    return halves.groupBy("doc_id").agg(*mins)


def minhash_signatures(shingles: DataFrame, n_hashes: int = 12) -> DataFrame:
    """(doc_id, seed, minh): per-seed MinHash over a Kirsch-Mitzenmacher
    double-hashed family — ONE md5 per shingle split into two 48-bit
    halves h1/h2, seed s hashing to (h1 + s*h2) mod 2^48. Statistically
    a 2-universal family, n_hashes-fold cheaper than seeded md5s, and
    engine-portable (DuckDB parses the same hex halves), so the oracle
    computes bit-identical signatures.

    Computed as ONE wide aggregation (n_hashes min() columns over a
    single groupBy(doc_id)) instead of exploding a seed column: the
    shuffle then carries one partially-aggregated row per (doc,
    partition) — n_hashes-fold less data through the exchange, which is
    what matters when the shingle table is billions of rows. The wide
    row is unpivoted afterwards (stack — free, no shuffle) to keep the
    (doc_id, seed, minh) contract."""
    wide = _minhash_wide(shingles, n_hashes)
    stack_args = ", ".join(f"{s}, m{s}" for s in range(n_hashes))
    return wide.select(
        "doc_id",
        F.expr(f"stack({n_hashes}, {stack_args}) AS (seed, minh)"),
    ).select("doc_id", F.col("seed").cast("int").alias("seed"), F.col("minh").cast("long").alias("minh"))


def minhash_lsh_bands(
    shingles: DataFrame, n_hashes: int = 12, rows_per_band: int = 3
) -> DataFrame:
    """Fused minhash+banding: (doc_id, band, sig) computed with ONE
    aggregation. The wide per-doc row of n_hashes mins already holds
    every band's members in order, so each band signature is just
    md5(concat_ws('|', m_i..m_j)) on that row — the per-(doc, band)
    regroup that ``minhash_signatures`` → ``lsh_bands`` would do is a
    whole shuffle of pure bookkeeping. Identical output to the unfused
    pair (property-tested)."""
    wide = _minhash_wide(shingles, n_hashes)
    # ceil: when rows_per_band doesn't divide n_hashes the tail seeds
    # form a partial final band, exactly as lsh_bands' seed div
    # rows_per_band grouping produces (the fused and unfused paths must
    # stay result-identical)
    n_bands = -(-n_hashes // rows_per_band)
    band_sigs = ", ".join(
        "{b}, md5(concat_ws('|', {ms}))".format(
            b=b,
            ms=", ".join(
                f"m{s}"
                for s in range(
                    b * rows_per_band, min((b + 1) * rows_per_band, n_hashes)
                )
            ),
        )
        for b in range(n_bands)
    )
    return wide.select(
        "doc_id",
        F.expr(f"stack({n_bands}, {band_sigs}) AS (band, sig)"),
    ).select("doc_id", F.col("band").cast("long").alias("band"), "sig")


def lsh_bands(signatures: DataFrame, rows_per_band: int = 3) -> DataFrame:
    """(doc_id, band, sig): concatenate each band's minhashes (ordered
    by seed — array_sort on (seed, minh) structs keeps it deterministic
    under unordered collect_list) and collapse to one md5 bucket key."""
    return (
        signatures.withColumn("band", F.expr(f"seed div {rows_per_band}").cast("long"))
        .groupBy("doc_id", "band")
        .agg(
            F.expr(
                "md5(array_join(transform(array_sort(collect_list(struct(seed, minh))),"
                " x -> cast(x.minh as string)), '|'))"
            ).alias("sig")
        )
    )


def lsh_candidate_pairs(
    bands: DataFrame, cache_registry: list | None = None
) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing any band bucket — an
    equi-join on (band, sig), never a cross product.

    The self-join consumes ``bands`` twice; with a ``cache_registry``
    the frame persists so the minhash pipeline upstream (shingle
    explode + signature aggregation — the expensive part) materializes
    once, and the registry owner unpersists after its action. WITHOUT
    a registry there is deliberately no persist (r12 review): an
    ownerless cached frame the caller never sees cannot be released
    and pins executor blocks for the session — recompute-twice is the
    honest price of not passing a registry."""
    if cache_registry is not None:
        bands = bands.persist()
        cache_registry.append(bands)
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


# Edge-count cutover between the single-task union-find solve and the
# iterative distributed loop. A dedup candidate graph is SPARSE (LSH
# emits ~O(dups) pairs, not O(corpus)); even a 100 TB corpus with a few
# hundred million near-dup pairs sits under a single fat task's memory,
# and a one-task union-find beats dozens of cluster-wide barrier rounds
# by orders of magnitude. Past the cap, the label-propagation loop is
# the (unchanged) scale path. Tunable per deployment.
CC_LOCAL_EDGE_CAP = int(os.environ.get("SPARK_GRAFT_CC_LOCAL_EDGES", "10000000"))


def _local_union_find(sym: DataFrame) -> DataFrame:
    """Single-task connected components: the symmetric edge list is
    coalesced into one partition and solved with path-halving union-find
    inside ``mapInPandas`` (Arrow batches in, one (doc_id, cluster_id)
    table out). Union attaches the LARGER root under the smaller, so
    every final root is its component's min id — same contract as the
    iterative path. O(E α(E)) work in one task instead of
    O(diameter) cluster-wide barrier rounds.

    Memory at the cap: the task holds one Python dict over the edge
    endpoints — <= 2 entries per symmetric edge row, so at the 10M-edge
    default cap worst case ~20M int->int entries ≈ 2-4 GB of executor
    heap (dict + int boxing). Deployments with smaller executors should
    lower SPARK_GRAFT_CC_LOCAL_EDGES accordingly; routing past the cap
    degrades to the propagation loop, never to an OOM."""

    def solve(batches):
        import pandas as pd

        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            # path-halving: point the walked chain at the root
            while parent.get(x, x) != root:
                parent[x], x = root, parent[x]
            return root

        seen: set[int] = set()
        for pdf in batches:
            for s, d in zip(pdf["src"].to_numpy(), pdf["dst"].to_numpy()):
                s, d = int(s), int(d)
                seen.add(s)
                seen.add(d)
                rs, rd = find(s), find(d)
                if rs != rd:
                    if rs < rd:
                        parent[rd] = rs
                    else:
                        parent[rs] = rd
        nodes = sorted(seen)
        yield pd.DataFrame(
            {"doc_id": nodes, "cluster_id": [find(n) for n in nodes]}
        )

    return (
        sym.select("src", "dst")
        .coalesce(1)
        .mapInPandas(solve, "doc_id long, cluster_id long")
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    a: str = "doc_a",
    b: str = "doc_b",
    max_iter: int = 25,
    cache_registry: list | None = None,
    local_edge_cap: int | None = None,
) -> DataFrame:
    """Duplicate-cluster assignment: connected components over a
    candidate-pair edge list, returning (doc_id, cluster_id) where
    cluster_id is the minimum doc_id in the component. This is the step
    the reference's per-probe best-match loop never needs but every
    corpus-scale dedup does: LSH/Jaccard emit PAIRS; keeping one doc per
    duplicate GROUP requires the transitive closure.

    TWO-LEVEL scheme. Dedup graphs are sparse, so the edge list is
    usually tiny relative to the corpus: at or under
    ``local_edge_cap`` (default CC_LOCAL_EDGE_CAP) edges the whole
    graph is solved by a single-task union-find (``_local_union_find``
    — O(E α(E)) in one task, zero barrier rounds); above it, the
    iterative min-label propagation below is the scale path. Both
    produce identical labels (test_connected_components_paths_agree).

    Iterative path: min-label propagation, TWO hops per materialization
    round, iterated over PAIRED nodes only. label(v) starts at v; each
    hop sets label(v) <- min over {v's label} ∪ {neighbors' labels} —
    expressed as one equi-join (neighbor contributions) + one union +
    one groupBy-min, i.e. exactly two shuffles per hop, both
    hash-partitioned on the node id so every round reuses the same
    partitioning. Stop when no label changed; hops needed = graph
    diameter (measured ~11 on the sf0.1 LSH graph — dup graphs chain
    through shared shingles more than the near-clique intuition
    suggests). Two hops per round halves the checkpoint +
    convergence-scalar count — the per-round latency floor locally and
    the barrier count on a cluster. Isolated documents never change
    labels, so the loop domain is nodes(sym) — at 100 TB that shrinks
    the iterated state from |corpus| to |paired nodes| (dedup graphs
    are sparse; this is usually orders of magnitude) — and singletons
    union back in once, after convergence. For adversarial long-chain
    graphs the literature's alternating large-star/small-star rounds
    (O(log^2 n)) drop in behind the same interface — documented, not
    needed at the measured diameters.

    Convergence is detected with one scalar aggregation per round:
    labels only ever decrease, so sum(label) is strictly monotone and
    sum_new == sum_old iff fixpoint over BOTH hops (no join against the
    previous state needed). Each round's labels are
    ``localCheckpoint``-ed (eager) and the previous round's blocks
    released immediately; the mid-round hop is persist()ed (it is
    referenced twice by the second hop) and released the same round —
    the live footprint is bounded by three label tables regardless of
    round count.

    Lineage MUST be truncated, not merely persisted: ``labels`` appears
    twice in each hop's plan, so without a per-round checkpoint the
    LOGICAL plan doubles per hop — O(2^hops) tree nodes — and Catalyst
    analysis time explodes around hop ~10 even though persist() keeps
    the physical recompute cheap (observed: a 12-node path graph ground
    Catalyst for >10 minutes). ``localCheckpoint`` stores blocks on the
    executors (lost on executor failure); a production cluster run with
    hours-long rounds would use ``sparkContext.setCheckpointDir`` +
    reliable ``checkpoint`` at the same call site.

    ``nodes`` (a 1-column DataFrame of doc ids) adds isolated documents
    as singleton clusters; pass the full corpus id set so the output is
    a total map, not just the paired subset.
    """
    sym = edges.select(
        F.col(a).cast("long").alias("src"), F.col(b).cast("long").alias("dst")
    ).union(
        edges.select(F.col(b).cast("long").alias("src"), F.col(a).cast("long").alias("dst"))
    ).distinct()
    # ownership rule (r12 review): persist only when a registry takes
    # the handle — an ownerless cache cannot be released. sym feeds the
    # edge count plus every hop (or the one-task solve); registry-less
    # callers trade recompute for leak-freedom.
    if cache_registry is not None:
        sym = sym.persist()
        cache_registry.append(sym)

    cap = CC_LOCAL_EDGE_CAP if local_edge_cap is None else local_edge_cap
    n_edges = sym.count()  # also materializes any persist
    if n_edges <= cap:
        # Small sparse graph: one-task union-find (see CC_LOCAL_EDGE_CAP
        # rationale) — no barrier rounds, no checkpoints.
        labels = _local_union_find(sym)
        if cache_registry is not None:
            # the union-find output feeds _with_singletons' anti-join
            # AND the final result: register the inner frame too, or
            # the re-assignment there orphans its cache (r12 review)
            labels = labels.persist()
            cache_registry.append(labels)
        return _with_singletons(labels, nodes, cache_registry)

    # Loop domain: nodes with at least one edge. sym is symmetric, so
    # src alone covers every endpoint.
    paired = sym.select(F.col("src").alias("doc_id")).distinct()
    labels = paired.select("doc_id", F.col("doc_id").alias("cluster_id")).persist()
    prev_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]

    def _hop(lab: DataFrame) -> DataFrame:
        # min over self ∪ neighbor labels via union + groupBy — no
        # left-outer join back onto lab (one fewer shuffle per hop than
        # the join-least-coalesce formulation)
        contrib = sym.join(
            lab.select(F.col("doc_id").alias("_lid"), "cluster_id"),
            sym.src == F.col("_lid"),
        ).select(F.col("dst").alias("doc_id"), "cluster_id")
        return (
            lab.select("doc_id", "cluster_id")
            .union(contrib)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
        )

    converged = False
    for _ in range(max_iter):
        # TWO hops per materialization round: labels move two graph hops
        # before paying the checkpoint + convergence-scalar round trip.
        # The inner hop is persist()ed (NOT checkpointed): the second
        # hop references it twice (join + union), and the cache makes
        # that one computation instead of two while the round's
        # localCheckpoint below still truncates the logical plan to a
        # leaf. Convergence stays sound: labels only ever decrease, so
        # an unchanged sum over the double hop means BOTH hops were
        # no-ops — a fixpoint.
        mid = _hop(labels).persist()
        new_labels = _hop(mid).localCheckpoint()
        new_sum = new_labels.agg(F.sum("cluster_id")).collect()[0][0]
        mid.unpersist()
        # Releases the round-0 persist; for checkpointed rounds the
        # blocks are RDD-level and the ContextCleaner frees them once
        # this (sole) reference drops.
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum

    if not converged:
        # Min-label propagation moves two hops per round; a component
        # with diameter > 2*max_iter would exit here with PARTIALLY
        # propagated labels — silently-wrong cluster ids. Refuse.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({2 * max_iter} hops — component diameter exceeds that); raise "
            f"max_iter or use an alternating-star formulation for long-chain "
            f"graphs"
        )

    return _with_singletons(labels, nodes, cache_registry)


def _with_singletons(
    labels: DataFrame, nodes: DataFrame | None, cache_registry: list | None
) -> DataFrame:
    """Union isolated documents (no edges) back in as singleton
    clusters — one left-anti + union AFTER convergence, never inside
    the loop (singleton labels can't change)."""
    if nodes is not None:
        node_ids = nodes.select(
            F.col(nodes.columns[0]).cast("long").alias("doc_id")
        ).distinct()
        singles = node_ids.join(labels, "doc_id", "left_anti").select(
            "doc_id", F.col("doc_id").alias("cluster_id")
        )
        labels = labels.union(singles)
    if cache_registry is not None:
        labels = labels.persist()
        cache_registry.append(labels)
    return labels


def exact_canonical_map(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup (hash-groupBy): every doc mapped to the canonical
    (min-id) doc having identical normalized content. Content compares
    by md5 of the normalized text — the shuffle key is a 32-char hash,
    not the document body (what you want at 100 TB)."""
    hashed = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(norm_key(F.col(text_col))).alias("content_hash"),
    )
    canon = hashed.groupBy("content_hash").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).cast("long").alias("n_copies"),
    )
    return hashed.join(canon, "content_hash").select(
        "doc_id", "content_hash", "canonical_id", "n_copies"
    )


def drop_hot_shingles(shingles: DataFrame, max_df: int) -> DataFrame:
    """Remove shingles appearing in more than ``max_df`` documents —
    the standard skew guard for shingle equi-joins: a shingle present
    in f documents contributes f_probe x f_cand join rows, so ubiquitous
    shingles (boilerplate, common words) dominate the pair fanout while
    carrying almost no similarity signal. This CHANGES the measured
    intersection (documented approximation — callers must apply the same
    cap to every side and to any oracle).

    df counts DISTINCT documents (r12 review): on non-distinct shingle
    input (the ``distinct=False`` variant this module's minhash path
    uses) a row count would silently turn the per-document cap into an
    occurrence cap — one document repeating a shingle 200 times would
    evict it corpus-wide. Identical on distinct input (every current
    caller), where (doc, shingle) rows are unique."""
    hot = (
        shingles.groupBy("shingle")
        .agg(F.countDistinct("doc_id").alias("_df"))
        .filter(F.col("_df") > max_df)
    )
    return shingles.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")


def jaccard_pairs(
    probe_shingles: DataFrame,
    cand_shingles: DataFrame,
    num: int = 1,
    den: int = 4,
) -> DataFrame:
    """n-gram Jaccard near-dup pairs: jaccard(a,b) >= num/den, computed
    with integer arithmetic only (den*|A∩B| >= num*|A∪B|) so the result
    is exact and oracle-portable — no float thresholds.

    Equi-join on the shingle, then one aggregation per pair. Common
    shingles fan out the join (skew); at scale drop ubiquitous shingles
    first (document-frequency cap) — the standard trick from the
    similarity-join literature.
    """
    sizes_p = probe_shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_a"))
    sizes_c = cand_shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_b"))
    p = probe_shingles.select(F.col("doc_id").alias("doc_a"), "shingle")
    c = cand_shingles.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        p.join(c, "shingle")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter_n"))
    )
    return (
        inter.join(sizes_p.select(F.col("doc_id").alias("doc_a"), "n_a"), "doc_a")
        .join(sizes_c.select(F.col("doc_id").alias("doc_b"), "n_b"), "doc_b")
        .withColumn("union_n", (F.col("n_a") + F.col("n_b") - F.col("inter_n")).cast("long"))
        .filter(F.col("inter_n") * den >= F.col("union_n") * num)
        .select("doc_a", "doc_b", "inter_n", "union_n")
    )


def lsh_recall_audit(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_hashes: int = 12,
    rows_per_band: int = 3,
    probe_mod: int = 10,
    num: int = 1,
    den: int = 10,
    cache_registry: list | None = None,
) -> DataFrame:
    """Recall curve of the MinHash-LSH candidate generator against exact
    n-gram Jaccard ground truth, bucketed by Jaccard decile:
    (jaccard_bucket, truth_pairs, lsh_found, recall).

    The audit a pipeline team runs BEFORE trusting (or re-tuning) the
    LSH parameters: ground truth is the exact shingle-Jaccard pair set
    (probe-sampled by ``doc_id % probe_mod`` and thresholded at
    ``num/den``, the same bounded shape as the registered Jaccard
    queries — never all-pairs); candidates are the banded LSH pairs at
    (``n_hashes``, ``rows_per_band``). Each truth pair lands in decile
    ``least(9, (10*inter) div union)`` (integer-exact, so jaccard=1.0
    folds into the top bucket) and the per-bucket hit rate traces the
    LSH S-curve: near-zero recall far below the band threshold
    (1/bands)^(1/rows) ≈ 0.63, rising to ~1.0 above it — the designed
    behavior, now measured instead of assumed.

    Scale shape: one shingle equi-join for truth (probe-bounded, the
    ubiquitous-shingle cap of ``drop_hot_shingles`` applies unchanged
    if needed), one banded equi-join for candidates, one pair-key left
    join, one tiny groupBy — no cross product anywhere. At 100 TB the
    probe sample IS the audit: recall estimates need thousands of
    truth pairs, not the full corpus.
    """
    # persist only under an owning registry: the returned frame is
    # lazy, so there is no in-function point where an ownerless persist
    # could be released — a registry-less caller would leak the cached
    # shingle blocks for the whole session (advisor finding, round 7).
    # Without a registry the shingle pass recomputes (correct, slower);
    # callers that evaluate the audit should pass a registry they drain.
    sh = char_shingles(docs, id_col, text_col, k=k)
    if cache_registry is not None:
        sh = sh.persist()
        cache_registry.append(sh)
    probes = sh.filter(F.col("doc_id") % probe_mod == 0)
    # undirected truth pairs: the directed probe-side join emits both
    # orientations when BOTH docs are probes; least/greatest + distinct
    # collapses them (inter/union are symmetric)
    truth = (
        jaccard_pairs(probes, sh, num=num, den=den)
        .select(
            F.least("doc_a", "doc_b").alias("lo"),
            F.greatest("doc_a", "doc_b").alias("hi"),
            "inter_n",
            "union_n",
        )
        .distinct()
    )
    lsh = lsh_candidate_pairs(
        minhash_lsh_bands(sh, n_hashes, rows_per_band),
        cache_registry=cache_registry,
    ).withColumn("_found", F.lit(1))
    return (
        truth.join(
            lsh,
            (truth["lo"] == lsh["doc_a"]) & (truth["hi"] == lsh["doc_b"]),
            "left",
        )
        .select(
            F.least(F.lit(9), F.expr("(inter_n * 10) div union_n"))
            .cast("int")
            .alias("jaccard_bucket"),
            F.coalesce(F.col("_found"), F.lit(0)).alias("_found"),
        )
        .groupBy("jaccard_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("truth_pairs"),
            F.sum("_found").cast("long").alias("lsh_found"),
            F.round(
                F.sum("_found").cast("double") / F.count(F.lit(1)), 4
            ).alias("recall"),
        )
    )


def simhash32(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """32-bit SimHash over whitespace tokens, fully built-in-expressible
    (and therefore oracle-portable): each token's md5 contributes its
    first 8 hex nibbles (32 bits); every bit votes +1/-1 weighted by
    the token's occurrence count; the fingerprint takes bit=1 on a
    non-negative vote (ties -> 1, deterministic).
    """
    toks = (
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.lower(F.col(text_col)).alias("_t"),
        )
        # spread docs before the token explode (see char_shingles)
        .repartition(_fanout_partitions(df), F.col("doc_id"))
        .select("doc_id", F.explode(F.split("_t", r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    # per-token md5 prefix once, then explode 8 nibbles x 4 bits
    nib = toks.select(
        "doc_id",
        F.md5(F.col("tok")).alias("h"),
        F.explode(F.expr("sequence(0, 7)")).alias("j"),
    ).select(
        "doc_id",
        "j",
        (F.instr(F.lit("0123456789abcdef"), F.expr("substring(h, j + 1, 1)")) - 1).alias(
            "nibble"
        ),
    )
    bits = nib.select(
        "doc_id",
        "j",
        F.explode(F.expr("sequence(0, 3)")).alias("b"),
        F.col("nibble"),
    ).select(
        "doc_id",
        (F.col("j") * 4 + F.col("b")).alias("bitpos"),
        (F.expr("nibble div int(pow(2, b))") % 2).alias("bit"),
    )
    votes = bits.groupBy("doc_id", "bitpos").agg(
        F.sum(F.col("bit") * 2 - 1).alias("vote")
    )
    return (
        votes.withColumn(
            "bitval",
            F.when(F.col("vote") >= 0, F.expr("cast(pow(2, bitpos) as long)")).otherwise(
                F.lit(0)
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("bitval").cast("long").alias("simhash"))
    )


def cluster_canonical(
    labels: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Survivor selection on top of `connected_components`: one
    canonical document per duplicate cluster — the longest text, ties
    broken by the smallest doc id (deterministic, engine-portable).

    One equi-join (labels x docs on the id) and one hash aggregation
    keyed on cluster_id: the argmax rides a single max(struct) partial
    aggregate (combinable map-side — no per-cluster window, so a giant
    duplicate cluster costs CPU, never executor memory). Returns
    (cluster_id, canonical_id, n_members).
    """
    joined = labels.join(
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.length(text_col).cast("long").alias("_len"),
        ),
        "doc_id",
    )
    # max(struct(len, -id)) == longest text, then smallest id on ties
    pick = F.max(F.struct(F.col("_len"), (-F.col("doc_id")).alias("_nid")))
    return joined.groupBy("cluster_id").agg(
        (-pick["_nid"]).cast("long").alias("canonical_id"),
        F.count(F.lit(1)).cast("long").alias("n_members"),
    )


def incremental_lsh_pairs(
    index,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_hashes: int = 12,
    rows_per_band: int = 3,
    txn_app: str | None = None,
    txn_version: int | None = None,
    cache_registry: list | None = None,
) -> DataFrame:
    """Incremental near-dup discovery against a PERSISTENT band index
    (round 9): ``index`` is a ``sinks.lakehouse.TransactionalTable`` of
    (doc_id, band, sig). Each ingest batch shingles + minhashes only
    its NEW documents, equi-joins their bands against the index for
    old x new candidates, self-joins for new x new, then appends the
    new bands transactionally. Returns the distinct (doc_a < doc_b)
    candidate pairs involving at least one new document.

    Equivalence (property-tested): processing a corpus in ANY ordered
    increments reports, in union, exactly the one-shot
    ``lsh_candidate_pairs`` pair set — identical band arithmetic, the
    index join covers cross pairs, the self-join covers new-internal
    pairs, and old-internal pairs were reported when THEY were new.

    Replay safety: the append carries (txn_app, txn_version), so a
    replayed batch skips the index write — index state is idempotent.
    The returned pairs are idempotent UNDER UNION: a replay reports a
    superset of the original batch's pairs (the original set, plus
    cross pairs against docs ingested after it — already reported by
    those later batches) and never a pair outside the one-shot set, so
    any consumer that accumulates pairs by union is unaffected.

    This is the 100-TB daily-ingest shape: per-batch cost is
    shingle/minhash over the new docs plus one equi-join against the
    index — never a recompute over the accumulated corpus."""
    docs = new_docs.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )
    nb = minhash_lsh_bands(
        char_shingles(docs, "doc_id", "text", k=k, distinct=False),
        n_hashes,
        rows_per_band,
    )
    # lsh_candidate_pairs persists nb (and registers it) — that one
    # persist also covers the cross join and the index append below
    pairs = lsh_candidate_pairs(nb, cache_registry=cache_registry)
    try:
        old = index.read()  # pins the pre-append snapshot's file list
    except FileNotFoundError:
        old = None
    if old is not None:
        cross = (
            old.select(F.col("doc_id").alias("_ia"), "band", "sig")
            .join(nb.select(F.col("doc_id").alias("_ib"), "band", "sig"), ["band", "sig"])
            .filter(F.col("_ia") != F.col("_ib"))
            .select(
                F.least("_ia", "_ib").alias("doc_a"),
                F.greatest("_ia", "_ib").alias("doc_b"),
            )
            .distinct()
        )
        pairs = pairs.unionByName(cross).distinct()
    index.append(
        nb.select("doc_id", "band", "sig"),
        txn_app=txn_app,
        txn_version=txn_version,
    )
    return pairs
