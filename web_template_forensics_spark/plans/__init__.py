from .queries import ORACLE_SQL, QUERIES, flagship  # noqa: F401
