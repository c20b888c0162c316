"""Plan inspection & scale utilities."""

from mysql_postgres_debezium_cdc_spark.plans import layout, skew  # noqa: F401  (registers queries)
from mysql_postgres_debezium_cdc_spark.plans.explain import explain_str, plan_report

__all__ = ["explain_str", "plan_report"]
