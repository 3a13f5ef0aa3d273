from astra_perseverance_spark.oracle.sqls import ORACLE_SQL

__all__ = ["ORACLE_SQL"]
