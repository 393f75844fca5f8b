"""Transactional table sinks (lakehouse-style commit log).

``TransactionalTable`` resolves lazily (PEP 562): the ``lakehouse``
data-source module — imported by every COLD Python data-source worker
fork — needs only the tiny ``lakehouse_ops`` leaf from this package,
and an eager re-export here would drag the full ~3700-line
``sinks.lakehouse`` driver-side module into each fork anyway (r19
cold-fork import diet; see ``lakehouse_ops``'s module docstring).
Driver-side callers see the identical surface.
"""

__all__ = ["TransactionalTable"]


def __getattr__(name: str):
    if name == "TransactionalTable":
        from .lakehouse import TransactionalTable

        return TransactionalTable
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
