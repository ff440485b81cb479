"""FileStore: the S3/FTP connection surface on the Hadoop filesystem API.

Reference operators re-expressed (lib/connections/s3.js, ftp.js):

- ``list_objects``   — marker-paginated bucket listing (s3.js:53-79)
- ``list_folders``   — folder set derived from keys (s3.js:32-51)
- ``object_exists``  — headObject (s3.js:96-108)
- ``delete`` / ``delete_folder`` — (s3.js:81-94, 110-128)
- ``get``            — FTP download stream (ftp.js:25-28) → read as DF
- ``list_files``     — recursive dir walk (ftp.js:30-71)
- ``streaming_upload`` — multipart upload (s3.js:130-146) → df.write

Paths are URIs: ``file:/…``, ``s3a://bucket/key``, ``hdfs://…`` — the
same code serves local dirs in tests and object stores on a cluster
(Hadoop FS picks the implementation from the scheme). Reads/writes are
Spark DataFrame reader/writer calls, so format support (parquet/csv/
json/text/orc) and predicate pushdown come for free.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession


class FileStore:
    def __init__(self, spark: SparkSession, base: str = "") -> None:
        self.spark = spark
        self.base = base.rstrip("/")
        jvm = spark.sparkContext._jvm
        self._jvm = jvm
        self._conf = spark.sparkContext._jsc.hadoopConfiguration()

    # ------------------------------------------------------------ fs plumbing
    def _path(self, key: str):
        uri = key if "://" in key or key.startswith("file:") else (
            f"{self.base}/{key}" if self.base else key
        )
        return self._jvm.org.apache.hadoop.fs.Path(uri)

    def _fs(self, key: str):
        return self._path(key).getFileSystem(self._conf)

    # ------------------------------------------------------------- listings
    def list_objects(self, prefix: str = "", recursive: bool = True) -> list[str]:
        """All object keys under a prefix (s3.js:53-79 — the manual marker
        pagination loop collapses into the FS iterator)."""
        p = self._path(prefix or ".")
        fs = self._fs(prefix or ".")
        if not fs.exists(p):
            return []
        out: list[str] = []
        it = fs.listFiles(p, recursive)
        while it.hasNext():
            out.append(it.next().getPath().toString())
        return sorted(out)

    def list_folders(self, prefix: str = "") -> list[str]:
        """Folder set derived from object keys (s3.js:32-51)."""
        folders = set()
        for key in self.list_objects(prefix):
            folders.add(posixpath.dirname(key))
        return sorted(folders)

    def list_files(self, prefix: str = "") -> list[dict]:
        """Recursive walk with metadata (ftp.js:30-71 returns name/size)."""
        p = self._path(prefix or ".")
        fs = self._fs(prefix or ".")
        if not fs.exists(p):
            return []
        out = []
        it = fs.listFiles(p, True)
        while it.hasNext():
            st = it.next()
            out.append(
                {
                    "name": st.getPath().toString(),
                    "size": st.getLen(),
                    "modified": st.getModificationTime(),
                }
            )
        return sorted(out, key=lambda d: d["name"])

    # -------------------------------------------------------------- presence
    def object_exists(self, key: str) -> bool:
        return bool(self._fs(key).exists(self._path(key)))

    def delete(self, key: str) -> bool:
        """Delete one object (s3.js:81-94)."""
        return bool(self._fs(key).delete(self._path(key), False))

    def delete_folder(self, key: str) -> bool:
        """Recursive delete (s3.js:110-128)."""
        return bool(self._fs(key).delete(self._path(key), True))

    # ------------------------------------------------------------------ data
    def get(self, key: str, fmt: str = "parquet", **options) -> DataFrame:
        """Read objects as a DataFrame (the FTP get → staging → load
        pipeline collapses to a direct distributed read)."""
        uri = self._path(key).toString()
        return self.spark.read.format(fmt).options(**options).load(uri)

    def streaming_upload(
        self, df: DataFrame, key: str, fmt: str = "parquet", mode: str = "overwrite",
        **options,
    ) -> None:
        """Distributed write (s3.js:130-146 streamingUpload: the multipart
        machinery is the FS committer's job; executors write in parallel —
        the actual scale win over the reference's single Node stream)."""
        uri = self._path(key).toString()
        df.write.format(fmt).mode(mode).options(**options).save(uri)
