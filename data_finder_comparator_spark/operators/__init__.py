from .curation import append_sink, apply_curation, curation_decisions, with_row_ids
from .dedup import (
    char_shingles,
    exact_canonical_map,
    jaccard_pairs,
    lsh_bands,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash32,
)
from .fuzzy_join import fuzzy_match_summary, tiered_fuzzy_join
from .html_extract import extract_html_text, html_block_text
from .multimodal import attach_binary_payload, binary_features
from .similarity import cosine, cosine_topk, dot, lsh_bucketed_topk
from .textops import doc_fingerprint, lang_guess, quality_signals, token_count

__all__ = [
    "append_sink",
    "apply_curation",
    "attach_binary_payload",
    "binary_features",
    "char_shingles",
    "cosine",
    "cosine_topk",
    "curation_decisions",
    "doc_fingerprint",
    "dot",
    "exact_canonical_map",
    "extract_html_text",
    "fuzzy_match_summary",
    "html_block_text",
    "jaccard_pairs",
    "lang_guess",
    "lsh_bands",
    "lsh_bucketed_topk",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "quality_signals",
    "simhash32",
    "tiered_fuzzy_join",
    "token_count",
    "with_row_ids",
]
