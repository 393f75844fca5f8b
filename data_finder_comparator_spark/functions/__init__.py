from .normalize import norm_key
from .distance import levenshtein_within, length_band_ok

__all__ = ["norm_key", "levenshtein_within", "length_band_ok"]
