"""Source/sink connectors: the Spark re-expression of the reference's
connection zoo (lib/connections/*.js). The Warehouse (catalog.py) covers
the MySQL/Redshift/Snowflake destination semantics; this package covers
the remaining surfaces: file/object stores (S3, FTP), document indices
(Elasticsearch), and JDBC databases."""

from empujar_spark.sources.files import FileStore
from empujar_spark.sources.documents import DocumentIndex
from empujar_spark.sources.jdbc import JdbcSource

__all__ = ["FileStore", "DocumentIndex", "JdbcSource"]
