"""Named query registry — the driver contract surface.

``REGISTRY`` maps query name → QuerySpec(fn, oracle_sql). The driver
(and our tests) run each Spark query against the DuckDB oracle at
sf0.01.
"""

from __future__ import annotations

from .base import QuerySpec
from .relational import RELATIONAL_QUERIES
from .timeseries import TIMESERIES_QUERIES

_ALL: list[QuerySpec] = [
    *TIMESERIES_QUERIES,
    *RELATIONAL_QUERIES,
]

try:  # extension families appended as they land
    from .textsim import TEXTSIM_QUERIES

    _ALL.extend(TEXTSIM_QUERIES)
except ImportError:
    pass

try:
    from .mlops import MLOPS_QUERIES

    _ALL.extend(MLOPS_QUERIES)
except ImportError:
    pass

try:
    from .media import MEDIA_QUERIES

    _ALL.extend(MEDIA_QUERIES)
except ImportError:
    pass

try:
    from .extras import EXTRA_QUERIES

    _ALL.extend(EXTRA_QUERIES)
except ImportError:
    pass

try:
    from .roundtrip import ROUNDTRIP_QUERIES

    _ALL.extend(ROUNDTRIP_QUERIES)
except ImportError:
    pass

REGISTRY: dict[str, QuerySpec] = {q.name: q for q in _ALL}
assert len(REGISTRY) == len(_ALL), "duplicate query names"
