"""PACK chapter (priority 400): deterministic stratified split + packed
training sequences → train_sequences.

Split assignment is the md5-bucket rule (stable under reruns and corpus
growth — operators/profile.py stratified_split); only the train split is
packed. Packing is md5-sharded (window partitions by shard), so the
running-sum never funnels the corpus through one partition.
"""

from pyspark.sql import functions as F


def chapter_loader(book):
    from empujar_spark.operators.curation import pack_sequences
    from empujar_spark.operators.profile import stratified_split

    chapter = book.add_chapter(400, "pack")
    wh = book.destination

    def pack():
        clean = wh.read("documents_clean").withColumnRenamed(
            "clean_text", "text"
        )
        split = stratified_split(
            clean, val_permille=100, test_permille=100
        ).select("doc_id", "split")
        train = clean.join(split, "doc_id").filter(F.col("split") == "train")
        packed = pack_sequences(train, budget=256, n_shards=8)
        wh.insert_data(
            "train_sequences",
            packed.join(split, "doc_id"),
            merge_key="doc_id",
        )

    chapter.add_page("sequences", pack)
