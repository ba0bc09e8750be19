"""city_payroll_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the capabilities of the
reference multi-tenant payroll analytics pipeline ("ArrowFlow",
reference: README.md:1-17): CSV ingest, two-layer medallion transforms
(staging -> fact) for three industries, a report/KPI layer, per-tenant
storage, and exports — plus large-scale training-data operators
(deduplication, similarity search, text analysis, multimodal columns)
designed for a 100 TB / 1000-executor deployment.

Everything is built on the public PySpark DataFrame/SQL API; logical
plans are declared declaratively and Catalyst/Tungsten pick the
physical strategy.
"""

from city_payroll_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
