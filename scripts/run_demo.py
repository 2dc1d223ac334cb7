#!/usr/bin/env python
"""End-to-end demo mirroring the reference's example pipeline
(``scripts/run.sh``): stage the two store documents, pack them into a
SequenceFile, then run both extraction configs over the same packed
input and print the outputs.

Usage: PYTHONPATH=. python scripts/run_demo.py [workdir] [--streaming]

With ``--streaming`` the ExtractInventory pass additionally runs
through the Structured Streaming path (landing-dir file source →
foreachBatch extract) and asserts it emits the identical rows — the
run.sh parity demo for the streaming layer.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from hadoopxmlextractor_spark import ExtractionConfig, extract
from hadoopxmlextractor_spark.sinks import to_reference_lines, write_reference_format
from hadoopxmlextractor_spark.sources import pack, read_sequence_file
from tests.fixtures import (
    BANKS,
    BOOK_CONFIG_XML,
    INVENTORY_CONFIG_XML,
    SOHO,
    make_store_xml,
)


def run_streaming_parity(spark, work: str, in_dir: str, batch_lines: list[str]) -> None:
    """Drive the streaming extraction over the same landing dir and
    assert row-for-row parity with the batch ExtractInventory output."""
    from hadoopxmlextractor_spark.streaming.extraction import extract_stream

    config = ExtractionConfig.from_hadoop_xml(INVENTORY_CONFIG_XML, is_text=True)
    collected: list[str] = []

    def sink(batch_df, batch_id: int) -> None:
        collected.extend(
            r["value"] for r in to_reference_lines(batch_df, config).collect()
        )

    ckpt = os.path.join(work, "stream_ckpt")
    shutil.rmtree(ckpt, ignore_errors=True)
    q = extract_stream(
        spark,
        in_dir,
        config,
        sink,
        checkpoint_dir=ckpt,
        trigger={"availableNow": True},
    )
    q.awaitTermination()
    print(f"\n== streaming ExtractInventory: {len(collected)} rows")
    assert sorted(collected) == sorted(batch_lines), (
        "streaming rows diverge from batch rows"
    )
    print("streaming output matches the batch path row-for-row")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    streaming = "--streaming" in sys.argv[1:]
    work = args[0] if args else tempfile.mkdtemp(prefix="xmlx_demo_")
    in_dir = os.path.join(work, "in")
    os.makedirs(in_dir, exist_ok=True)
    with open(os.path.join(in_dir, "InventorySoho.xml"), "w") as f:
        f.write(make_store_xml(SOHO))
    with open(os.path.join(in_dir, "InventoryBanks.xml"), "w") as f:
        f.write(make_store_xml(BANKS))

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("xmlextractor-demo")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # run.sh step 1: pack the directory into one SequenceFile
    seq_path = os.path.join(work, "packed.seq")
    shutil.rmtree(seq_path, ignore_errors=True)
    pack(spark, in_dir, seq_path)
    docs = read_sequence_file(spark, seq_path).cache()
    print(f"packed {docs.count()} documents into {seq_path}")

    # run.sh steps 2-3: two extraction configs over the same input
    inventory_lines: list[str] = []
    for label, cfg_xml in [
        ("ExtractInventory", INVENTORY_CONFIG_XML),
        ("ExtractBook", BOOK_CONFIG_XML),
    ]:
        config = ExtractionConfig.from_hadoop_xml(cfg_xml, is_text=True)
        result = extract(docs, config)
        out_dir = os.path.join(work, f"out_{label}")
        shutil.rmtree(out_dir, ignore_errors=True)
        write_reference_format(result, config, out_dir)
        lines = [r["value"] for r in to_reference_lines(result, config).collect()]
        if label == "ExtractInventory":
            inventory_lines = lines
        print(f"\n== {label}: {len(lines)} rows -> {out_dir}")
        for line in lines:
            print(line)

    if streaming:
        run_streaming_parity(spark, work, in_dir, inventory_lines)


if __name__ == "__main__":
    main()
