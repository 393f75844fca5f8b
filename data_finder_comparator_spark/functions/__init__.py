from .alignment import alignment_udf, diff_splices, splices_udf, visual_alignment
from .distance import length_band_ok, levenshtein_within
from .normalize import norm_key

__all__ = [
    "alignment_udf",
    "diff_splices",
    "length_band_ok",
    "levenshtein_within",
    "norm_key",
    "splices_udf",
    "visual_alignment",
]
