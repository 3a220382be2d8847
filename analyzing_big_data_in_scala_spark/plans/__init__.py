from .registry import QUERIES, QuerySpec, oracle_sql_map, query, query_map  # noqa: F401

# Importing the query modules populates the registry.
from . import relational_queries  # noqa: F401,E402
from . import text_queries  # noqa: F401,E402
from . import graph_queries  # noqa: F401,E402
from . import pipeline_queries  # noqa: F401,E402
from . import streaming_queries  # noqa: F401,E402
