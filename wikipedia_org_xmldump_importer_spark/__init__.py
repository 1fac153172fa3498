"""wikipedia_org_xmldump_importer_spark — a PySpark-native analytics engine.

A brand-new, idiomatic Spark 4 engine providing the data-processing and query
capabilities of ``kodekrash/wikipedia.org-xmldump-importer`` (MediaWiki XML
dump -> relational ETL; see SURVEY.md §0-§1 for provenance — the reference
checkout was empty this session, so the capability surface is reconstructed
from the public MediaWiki export XSD / SQL schema and the driver contract in
BASELINE.json), plus the driver-mandated LLM-data-pipeline operator suite
(dedup, similarity search, multimodal columns, text analysis).

Design rules (SURVEY.md §1.3/§3.3):
  * DataFrame/SQL only — every operator is visible to Catalyst.
  * No row-at-a-time Python UDFs in hot paths; Arrow-batched pandas UDFs only
    where §2 explicitly declares a UDF operator.
  * Explicit schemas at ingestion; columnar at rest (Parquet) and in flight
    (Arrow).
  * Every operator carries a 100 TB design note in its docstring: partitioning
    keys, shuffle behavior, broadcast decisions, skew handling.
"""

__version__ = "0.1.0"
