from .fuzzy_join import tiered_fuzzy_join, fuzzy_match_summary

__all__ = ["tiered_fuzzy_join", "fuzzy_match_summary"]
