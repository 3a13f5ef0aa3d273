from astra_perseverance_spark.oracle.ext_sqls import EXT_ORACLE_SQL
from astra_perseverance_spark.oracle.sqls import ORACLE_SQL as _CORE_ORACLE_SQL
from astra_perseverance_spark.oracle.warn_sqls import WARN_ORACLE_SQL

ORACLE_SQL: dict[str, str] = {
    **_CORE_ORACLE_SQL, **EXT_ORACLE_SQL, **WARN_ORACLE_SQL,
}

__all__ = ["ORACLE_SQL"]
