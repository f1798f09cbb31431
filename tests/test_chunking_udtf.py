"""Spark 4 Python UDTF form of the chunker: lateral-join SQL ergonomics,
row parity with the pandas-UDF path."""

from inception_spark.operators.chunking import chunk_documents, make_chunk_udtf


def test_chunk_udtf_lateral_join(spark, sample_opinion):
    spark.udtf.register("chunk_table", make_chunk_udtf())
    spark.createDataFrame(
        [(1, sample_opinion), (2, "Tiny. Doc.")], "id long, text string"
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        """
        SELECT d.id, c.chunk_number, c.chunk, c.n_tokens
        FROM udtf_docs d, LATERAL chunk_table(d.text) c
        """
    ).collect()
    assert {r["id"] for r in rows} == {1, 2}
    assert all(r["n_tokens"] <= 512 for r in rows)

    # row-for-row parity with the pandas-UDF + posexplode path
    batch = chunk_documents(
        spark.table("udtf_docs"), id_col="id", text_col="text"
    ).collect()
    a = {(r["id"], r["chunk_number"]): (r["chunk"], r["n_tokens"]) for r in rows}
    b = {(r["doc_id"], r["chunk_number"]): (r["chunk"], r["n_tokens"]) for r in batch}
    assert a == b
