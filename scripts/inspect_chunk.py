"""Inspect chunk blobs from an encoded table — the engine's `inspect`
command (reference analogue: the copybook-rs CLI's inspect/validate
surface). Prints each selected chunk's structural description as JSON:
header fields, per-section byte sizes, doc-id encoding, values mode, and
the full codec tree of every integer payload — WITHOUT decompressing any
values, so inspecting one blob out of a 100 TB table costs header reads.

Usage:
  PYTHONPATH=. python scripts/inspect_chunk.py <encoded_dir> [chunk_id_prefix]
  PYTHONPATH=. python scripts/inspect_chunk.py --blob-file some_chunk.bin
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("encoded_dir", nargs="?", help="write_encoded output dir")
    ap.add_argument("prefix", nargs="?", default="", help="chunk_id prefix filter")
    ap.add_argument("--blob-file", help="describe one raw blob file instead")
    ap.add_argument("--limit", type=int, default=3)
    args = ap.parse_args()

    from copybook_rs_spark import blob

    if args.blob_file:
        data = Path(args.blob_file).read_bytes()
        print(json.dumps(blob.describe_chunk(data), indent=2, default=str))
        return
    if not args.encoded_dir:
        ap.error("need an encoded_dir or --blob-file")

    from copybook_rs_spark.session import get_spark
    from copybook_rs_spark.sources.manifest import read_chunks

    spark = get_spark("inspect", cores=2, shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")
    df = read_chunks(spark, args.encoded_dir).select("chunk_id", "blob")
    if args.prefix:
        from pyspark.sql import functions as F

        df = df.filter(F.col("chunk_id").startswith(args.prefix))
    for row in df.limit(args.limit).collect():
        print(f"=== {row['chunk_id']} ===")
        print(json.dumps(blob.describe_chunk(bytes(row["blob"])), indent=2,
                         default=str))
    spark.stop()


if __name__ == "__main__":
    main()
