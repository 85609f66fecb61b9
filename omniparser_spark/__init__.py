"""omniparser_spark — a PySpark-native CDC / incremental-ingest engine.

A brand-new engine (NOT a port) with the query/data-processing
capabilities of jf-tech/omniparser, re-imagined Spark-first:

- omniparser's declarative ``transform_declarations`` schemas
  (reference: ``extensions/omniv21/transform/decl.go``) become a
  mapping spec compiled to **column expressions** + vectorized
  pandas/Arrow UDF stages (never per-row Python) — see
  :mod:`omniparser_spark.spec`.
- its file formats (csv/csv2/fixedlength/json/xml/edi — reference:
  ``extensions/omniv21/fileformat/``) become vectorized payload
  decoders over a ``format`` dispatch column — see
  :mod:`omniparser_spark.sources.decoders`.
- its record-at-a-time streaming loop becomes a partitioned,
  checkpointed micro-batch CDC apply loop with LWW dedup and
  idempotent MERGE into a lake table with monotonic offset fencing —
  see :mod:`omniparser_spark.cdc.pipeline` and
  :mod:`omniparser_spark.lake`.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the MIT-licensed jf-tech/omniparser reference.
"""

__version__ = "0.1.0"

from omniparser_spark.session import get_spark  # noqa: F401
