"""Query-plan registry package.

Importing this package populates ``REGISTRY`` with every implemented
operator's (spark_fn, oracle_sql) pair. Modules register via the
``@register`` decorator in ``registry``.
"""

from . import registry
from .registry import REGISTRY, QuerySpec, load, oracle_sql, queries, register

# Import for registration side effects — order groups the registry roughly
# by SURVEY.md §2 section.
from . import relational  # noqa: E402,F401  §2.1-2.2, 2.4, 2.6, 2.8
from . import joins       # noqa: E402,F401  §2.3, 2.7
from . import windows     # noqa: E402,F401  §2.5, 2.9, grouping sets
from . import llm         # noqa: E402,F401  §2.11 dedup/similarity/text/multimodal
from . import arrays      # noqa: E402,F401  §2.8 array/JSON families, SQL façade
from . import temporal_skew  # noqa: E402,F401  as-of join, skew mitigation
from . import analytics   # noqa: E402,F401  range join, rollups, percentiles, moments
from . import scalars_ext  # noqa: E402,F401  extended string/date scalar coverage
from . import weather_ingest  # noqa: E402,F401  §2.1/2.9 ingestion differential

__all__ = ["REGISTRY", "QuerySpec", "load", "oracle_sql", "queries", "register"]
