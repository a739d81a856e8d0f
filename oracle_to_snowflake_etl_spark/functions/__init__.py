from .kpis import safe_ratio, with_kpis  # noqa: F401
from .sqlshim import rewrite_snowflake_sql  # noqa: F401
