"""Query plans demonstrating the engine's operator surface (SURVEY.md §2).

``registry`` collects every demonstration query plus its DuckDB oracle SQL;
`__spark_entry__.py` re-exports them for the driver's correctness gate.
"""

from .registry import ORACLES, QUERIES, query

# Importing these modules populates the registry.
from . import relational  # noqa: E402,F401
from . import reference_pipeline  # noqa: E402,F401
from . import text_queries  # noqa: E402,F401
from . import vector_queries  # noqa: E402,F401
from . import extended  # noqa: E402,F401
from . import advanced  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import graph_queries  # noqa: E402,F401
from . import history  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query"]
