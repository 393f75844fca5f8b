"""data_finder_comparator_spark — a PySpark-native fuzzy data finder/comparator.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference tool ``Unex256/data-finder-comparator``
(see SURVEY.md): multi-file union-by-name ingestion, normalized
Levenshtein similarity joins with tiered match classification
(exact / best / potential / poor, exact tie semantics), per-character
alignment visualization, keep/replace row curation with an append sink,
and a pipelined (micro-batch) processing mode — plus large-scale
training-data-pipeline operators: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding-cosine), similarity search
(brute-force + LSH-bucketed ANN), text analysis (language-ID, quality
scoring, token counting, fingerprinting), and multimodal column
plumbing.

Everything is expressed DataFrame-first so Catalyst handles pushdown,
pruning, join strategy, and whole-stage codegen; Python only runs in
Arrow-batched pandas UDFs for the few operators Spark cannot express
(alignment visualization, custom sketches).
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
