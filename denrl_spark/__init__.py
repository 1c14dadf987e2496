"""denrl_spark — a brand-new PySpark-native knowledge-graph construction engine.

Reimplements the dataflow semantics of yul091/DENRL (distantly-supervised
joint entity and relation extraction, ACL 2024 Findings) as staged Spark
DataFrame jobs over transcript tables, per SURVEY.md. Not a port: the
reference's PyTorch training machinery is replaced by deterministic,
broadcastable scoring functions; every relational stage is expressed with
built-in pyspark.sql operators so Catalyst/AQE own the physical plan, and
every per-row kernel is an Arrow-batched pandas UDF (no per-row Python).
"""

__version__ = "0.1.0"
