"""Named query registry — the engine's declared operator surface.

Every operator from SURVEY.md §2 lands here as a named query: a function
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a DuckDB
oracle SQL string the driver runs side-by-side for the correctness gate.

Import order populates the registry.
"""

from .registry import QUERIES, oracle_sql, queries, register  # noqa: F401

# Registration side effects — each module adds its queries on import.
from . import relational  # noqa: E402,F401
from . import relational_ext  # noqa: E402,F401
from . import reference_model  # noqa: E402,F401
from . import reference_ext  # noqa: E402,F401
from . import llm_ops  # noqa: E402,F401
from . import streaming_batch  # noqa: E402,F401
