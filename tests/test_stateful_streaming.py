"""applyInPandasWithState cross-page host dedup."""

from pyspark.sql import functions as F, types as T


def test_host_dedup_stream(spark, tmp_path):
    from rs_trafilatura_spark.streaming.stateful import host_dedup_stream

    boiler = ("Subscribe to our fantastic newsletter for updates every single "
              "week of the year, free of charge and full of value.")
    uniq = [
        f"Unique article body {i} with its own long and distinctive prose "
        f"content that repeats nowhere else in the corpus at all."
        for i in range(6)
    ]
    rows = [
        (f"https://a.example/p{i}", "a.example", f"{uniq[i]}\n\n{boiler}")
        for i in range(6)
    ]
    schema = T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("hostname", T.StringType(), True),
        T.StructField("content_text", T.StringType(), True),
    ])
    src = str(tmp_path / "in")
    spark.createDataFrame(rows, schema).repartition(1).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    out = host_dedup_stream(stream)
    # NOTE: availableNow + processAllAvailable hangs with
    # applyInPandasWithState on Spark 4.1; once-trigger works
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("host_dedup_t").trigger(once=True).start())
    import time

    for _ in range(120):
        if not q.isActive:
            break
        time.sleep(1)
    assert not q.isActive, "stateful streaming query did not finish"
    res = {r["url"]: r for r in spark.sql("SELECT * FROM host_dedup_t").collect()}
    assert len(res) == 6
    n_with_boiler = sum(
        1 for r in res.values() if boiler in r["content_text"]
    )
    # first 3 occurrences of the >100-char boilerplate block survive,
    # later ones are dropped (reference LRU semantics across pages)
    assert n_with_boiler == 3
    total_dropped = sum(r["n_blocks_dropped"] for r in res.values())
    assert total_dropped == 3
    # unique bodies are never dropped
    assert all(uniq[i] in res[f"https://a.example/p{i}"]["content_text"]
               for i in range(6))
