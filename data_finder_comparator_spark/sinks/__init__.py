"""Transactional table sinks (lakehouse-style commit log)."""

from .lakehouse import TransactionalTable

__all__ = ["TransactionalTable"]
