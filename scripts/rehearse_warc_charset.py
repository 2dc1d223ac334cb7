#!/usr/bin/env python
"""VERDICT r14 item 4: fused vs unfused source_warc_charset chain at
10x corpus bytes (50k synthesized docs vs sf0.1's 5k). Both variants
read the same id range with the same parallelism; interleaved
min-of-N with the noop sink. Prints one line per variant."""
from __future__ import annotations

import gzip
import os
import sys
import time
from typing import Iterator

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", str(CPUS))
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from hadoopxmlextractor_spark.operators import text as T  # noqa: E402
from hadoopxmlextractor_spark.sources import warc as W  # noqa: E402
from hadoopxmlextractor_spark.queries_r11 import _charset_page  # noqa: E402

docs = spark.range(N, numPartitions=CPUS).select(F.col("id").alias("doc_id"))


def fused(docs):
    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "http_status", "encoding", "enc_source", "text"]
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                i = int(i)
                ctype, body = _charset_page(i)
                hdr = b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n"
                if (i // 8) % 2 == 0:
                    hdr += b"Content-Encoding: gzip\r\n"
                    body = gzip.compress(body, 6)
                blob = W.write_warc(
                    [{
                        "warc_type": "response",
                        "record_id": f"<urn:chs:{i}>",
                        "target_uri": f"https://example.com/{i}",
                        "content_type": "application/http; msgtype=response",
                        "payload": hdr + b"\r\n" + body,
                    }],
                    gzip_members=(i % 2 == 0),
                )
                for rec in W.iter_warc_records(blob):
                    if rec.get("warc_type") != "response":
                        continue
                    s, enc, how, text = W.decode_http_html(bytes(rec["payload"]))
                    rows.append({"doc_id": i, "http_status": s, "encoding": enc,
                                 "enc_source": how, "text": text})
            yield pd.DataFrame(rows, columns=cols)

    recs = docs.mapInPandas(
        _kernel,
        schema="doc_id bigint, http_status int, encoding string, "
        "enc_source string, text string",
    )
    return (
        recs.select("doc_id", "http_status", "encoding", "enc_source",
                    T.html_text(F.col("text")).alias("extracted"))
        .withColumn("n_chars", F.length("extracted").cast("int"))
    )


def unfused(docs):
    @F.pandas_udf("binary")
    def _warc(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for ids in it:
            out = []
            for i in ids:
                ctype, body = _charset_page(int(i))
                hdr = b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n"
                if (int(i) // 8) % 2 == 0:
                    hdr += b"Content-Encoding: gzip\r\n"
                    body = gzip.compress(body, 6)
                out.append(W.write_warc(
                    [{
                        "warc_type": "response",
                        "record_id": f"<urn:chs:{i}>",
                        "target_uri": f"https://example.com/{i}",
                        "content_type": "application/http; msgtype=response",
                        "payload": hdr + b"\r\n" + body,
                    }],
                    gzip_members=(int(i) % 2 == 0),
                ))
            yield pd.Series(out)

    files = docs.select(
        F.col("doc_id").cast("string").alias("path"),
        _warc("doc_id").alias("content"),
    )
    recs = W.warc_records(files).filter(F.col("warc_type") == "response")

    @F.pandas_udf(
        "struct<http_status:int, encoding:string, enc_source:string, "
        "text:string>"
    )
    def _decode(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for payloads in it:
            rows = []
            for p in payloads:
                s, enc, how, text = W.decode_http_html(bytes(p))
                rows.append({"http_status": s, "encoding": enc,
                             "enc_source": how, "text": text})
            yield pd.DataFrame(rows)

    return (
        recs.withColumn("h", _decode("payload"))
        .select(
            F.col("path").cast("bigint").alias("doc_id"),
            F.col("h.http_status").alias("http_status"),
            F.col("h.encoding").alias("encoding"),
            F.col("h.enc_source").alias("enc_source"),
            T.html_text(F.col("h.text")).alias("extracted"),
        )
        .withColumn("n_chars", F.length("extracted").cast("int"))
    )


# rows identical both ways (the oracle pins the fused form; this pins
# fused == unfused at the rehearsal scale on a sample)
sample = docs.filter(F.col("doc_id") < 2000)
a, b = fused(sample), unfused(sample)
assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
print("rows identical on 2000-doc sample", file=sys.stderr)

times = {"fused": [], "unfused": []}
for r in range(ROUNDS):
    for name, fn in (("fused", fused), ("unfused", unfused)):
        t0 = time.perf_counter()
        fn(docs).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        times[name].append(dt)
        print(f"  round {r} {name}: {dt:.2f}s", file=sys.stderr)
for name, ts in times.items():
    print(f"{name}: min {min(ts):.2f}s  all {[round(t,2) for t in ts]}")
