from .io import (
    RATINGS_SQL,
    TABLES,
    TS_COLUMNS,
    load_table,
    ratings,
    register_views,
    with_ratings_cte,
)

__all__ = [
    "RATINGS_SQL",
    "TABLES",
    "TS_COLUMNS",
    "load_table",
    "ratings",
    "register_views",
    "with_ratings_cte",
]
