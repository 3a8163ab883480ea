"""Generate fixture-parquet PINS for the two codec-introspection driver
queries (`codec_histogram`, `compression_ratio`).

Unlike scripts/make_oracle_fixtures.py (an INDEPENDENT per-doc Python
reimplementation of the simhash/multimodal kernels), these fixtures are
engine-generated regression pins: chunk-table content is a pure function of
the input data (invariant 2 — parallelism/cluster-width never leak into
chunk bytes), so the per-(source, codec) chunk histogram and the per-source
byte totals are exact deterministic values worth pinning at the driver
gate. A pin failure means the codec stack's OUTPUT changed — either a
regression, or a deliberate format/selection change that must regenerate
the pins in the same commit (the goldens stance, tests/test_golden.py).

Regenerate (after a DELIBERATE codec-stack output change only):
    PYTHONPATH=. python scripts/make_codec_pins.py
"""

from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
OUT_DIR = Path(__file__).resolve().parent.parent / "tests" / "fixtures"


def main() -> None:
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __spark_entry__ as ent
    from pyspark.sql import functions as F
    from copybook_rs_spark.session import get_spark
    from copybook_rs_spark.sources.tokens import token_table

    spark = get_spark("codec-pins", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    hist_rows, ratio_rows = [], []
    for sf_dir in SF_DIRS:
        sf_key = int(
            token_table(spark, sf_dir).agg(F.sum("n_tok")).collect()[0][0]
        )
        for r in ent.queries()["codec_histogram"](spark, sf_dir).collect():
            hist_rows.append(
                (sf_key, r["source"], r["codec"], int(r["n_chunks"]),
                 int(r["enc_bytes"]))
            )
        for r in ent.queries()["compression_ratio"](spark, sf_dir).collect():
            ratio_rows.append(
                (sf_key, r["source"], int(r["raw_bytes"]), int(r["enc_bytes"]),
                 float(r["bytes_per_token"]))
            )
        print(f"{sf_dir}: sf_key={sf_key}, "
              f"{sum(1 for h in hist_rows if h[0] == sf_key)} hist rows")

    hist = pa.table(
        {
            "sf_key": pa.array([r[0] for r in hist_rows], pa.int64()),
            "source": pa.array([r[1] for r in hist_rows], pa.string()),
            "codec": pa.array([r[2] for r in hist_rows], pa.string()),
            "n_chunks": pa.array([r[3] for r in hist_rows], pa.int64()),
            "enc_bytes": pa.array([r[4] for r in hist_rows], pa.int64()),
        }
    )
    ratio = pa.table(
        {
            "sf_key": pa.array([r[0] for r in ratio_rows], pa.int64()),
            "source": pa.array([r[1] for r in ratio_rows], pa.string()),
            "raw_bytes": pa.array([r[2] for r in ratio_rows], pa.int64()),
            "enc_bytes": pa.array([r[3] for r in ratio_rows], pa.int64()),
            "bytes_per_token": pa.array(
                [r[4] for r in ratio_rows], pa.float64()
            ),
        }
    )
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    pq.write_table(hist, OUT_DIR / "codec_pins_histogram.parquet")
    pq.write_table(ratio, OUT_DIR / "codec_pins_ratio.parquet")
    print(f"wrote {OUT_DIR}/codec_pins_{{histogram,ratio}}.parquet")
    spark.stop()


if __name__ == "__main__":
    main()
