"""Oracle SQL registry — see :mod:`.sql`."""

from .sql import oracle_sql

__all__ = ["oracle_sql"]
