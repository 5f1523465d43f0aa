from .queries import ORACLE_SQL, QUERIES, flagship, oracle_sql_all  # noqa: F401
