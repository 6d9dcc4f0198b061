"""wp_motor_spark — a PySpark-native streaming-ETL / analytics engine.

Re-expresses the capabilities of the reference engine (wp-labs/wp-motor, a
Rust streaming ETL engine for logs/metrics/events) as idiomatic Spark:

- WPL (parse DSL)  -> per-rule anchored-regex extraction plans (Column DAGs)
- OML (transform DSL) -> Column expression pipelines
- KnowDB enrichment -> broadcast hash / range joins
- sink routing conditions -> filter Columns
- windowed stats -> groupBy(window(...), dims) aggregations
- plus large-scale training-data ops: dedup, similarity search, text analysis.

Everything compiles to declarative DataFrame plans so Catalyst/Tungsten pick
the physical strategy; Python UDFs only where semantics genuinely require.
"""

__version__ = "0.1.0"
