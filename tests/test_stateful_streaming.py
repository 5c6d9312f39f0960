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


def test_host_dedup_stream_salted(spark, tmp_path):
    """n_salts>1 shards a megasite: raw host still reported, dedup happens
    within each salt bucket (a block repeated R times survives at most
    3 * n_salts times)."""
    from rs_trafilatura_spark.streaming.stateful import host_dedup_stream

    boiler = ("Accept all cookies to continue enjoying this site with the "
              "best personalized experience we can possibly offer you here.")
    rows = [
        (f"https://mega.example/p{i}", "mega.example",
         f"Body {i} distinctive prose long enough to stand on its own "
         f"without tripping any duplicate heuristics anywhere.\n\n{boiler}")
        for i in range(16)
    ]
    schema = T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("hostname", T.StringType(), True),
        T.StructField("content_text", T.StringType(), True),
    ])
    src = str(tmp_path / "in_salted")
    spark.createDataFrame(rows, schema).repartition(1).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    out = host_dedup_stream(stream, n_salts=2)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("host_dedup_salted_t").trigger(once=True).start())
    import time

    for _ in range(120):
        if not q.isActive:
            break
        time.sleep(1)
    assert not q.isActive
    res = spark.sql("SELECT * FROM host_dedup_salted_t").collect()
    assert len(res) == 16
    # raw host reported, never the salted key
    assert {r["host"] for r in res} == {"mega.example"}
    n_with_boiler = sum(1 for r in res if boiler in r["content_text"])
    # per bucket the first 3 survive; 2 buckets -> at most 6 total, and the
    # block IS deduped (16 repeats can't all survive)
    assert 3 <= n_with_boiler <= 6
