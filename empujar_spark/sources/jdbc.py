"""JdbcSource: the MySQL/Redshift/Snowflake *source* surface as Spark
JDBC reads (no MySQL/Postgres driver jars in this container and no live
DB endpoints — re-probed r16: only hive-jdbc under /opt/spark/jars,
ports 3306/5432/9200 closed. Construction works, reads raise a clear
error until a jar is provided; covered by contract tests).

Reference parity (lib/connections/mysql.js):
- ``get_all(query, …)``  — the LIMIT-offset pagination loop (mysql.js:
  232-256) becomes a partitioned JDBC read: ``partition_column/lower/
  upper/num_partitions`` split the scan across executors (the scale path
  the reference's serial loop cannot take).
- ``get_max`` / ``table_size`` — pushdown aggregate queries.
- ``query(sql)`` — arbitrary SQL via the ``query`` option (pushed to the
  database, reference mysql.js:113-179).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class JdbcSource:
    def __init__(
        self,
        spark: SparkSession,
        url: str,
        user: str | None = None,
        password: str | None = None,
        driver: str | None = None,
        fetch_size: int = 10_000,
    ) -> None:
        self.spark = spark
        self.url = url
        self._opts = {"url": url, "fetchsize": str(fetch_size)}
        if user:
            self._opts["user"] = user
        if password:
            self._opts["password"] = password
        if driver:
            self._opts["driver"] = driver

    def _reader(self, **options):
        return self.spark.read.format("jdbc").options(**{**self._opts, **options})

    def query(self, sql: str) -> DataFrame:
        """Pushdown SQL (reference ``query``): the database executes it,
        Spark reads the result set."""
        return self._reader(query=sql).load()

    def get_all_options(
        self,
        table: str,
        partition_column: str | None = None,
        lower_bound=None,
        upper_bound=None,
        num_partitions: int = 8,
    ) -> dict:
        """The EXACT option dict ``get_all`` hands the JDBC DataSource
        (connection opts merged with the scan opts) — the testable plan
        boundary: no live database exists in this sandbox and no driver
        jar is installed, so contract tests assert the partitioning and
        pushdown options are wired here instead of against an endpoint
        (the layer reference test/connections/mysql.js:143-208 exercises
        live)."""
        opts: dict = {**self._opts, "dbtable": table}
        if partition_column is not None:
            if lower_bound is None or upper_bound is None:
                # str(None) would reach the JDBC datasource as the literal
                # 'None' and die in a cryptic bound-parse error deep inside
                # the relation — fail loudly at the call site instead
                raise ValueError(
                    "partition_column requires explicit lower_bound and "
                    "upper_bound (run a MIN/MAX query first, or omit "
                    "partition_column for a single-partition read)"
                )
            opts.update(
                partitionColumn=partition_column,
                lowerBound=str(lower_bound),
                upperBound=str(upper_bound),
                numPartitions=str(num_partitions),
            )
        return opts

    def get_all(
        self,
        table: str,
        partition_column: str | None = None,
        lower_bound=None,
        upper_bound=None,
        num_partitions: int = 8,
        limit: int | None = None,
    ) -> DataFrame:
        """Full scan (reference getAll, mysql.js:232-256). With a numeric
        ``partition_column`` the read is split into ``num_partitions``
        range-parallel queries — replacing the serial LIMIT-offset loop.
        ``limit`` honors getAllLimit (lib/book.js:74)."""
        opts = self.get_all_options(
            table, partition_column, lower_bound, upper_bound,
            num_partitions,
        )
        df = self.spark.read.format("jdbc").options(**opts).load()
        return df.limit(limit) if limit is not None else df

    def get_max(self, table: str, column: str):
        """MAX watermark, pushed down (mysql.js:193-216)."""
        row = self.query(f'SELECT MAX({column}) AS "max" FROM {table}').first()
        return row["max"] if row else None

    def table_size(self, table: str) -> int:
        """COUNT, pushed down (redshift.js:129-135)."""
        row = self.query(f'SELECT count(1) AS "total" FROM {table}').first()
        return int(row["total"]) if row else 0
