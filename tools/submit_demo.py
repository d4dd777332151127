"""spark-submit entry point demonstrating the cluster launch path.

Build the artifact and launch (from anywhere — the repo must NOT be on
PYTHONPATH; go_muse_spark is imported from the --py-files zip, exactly
as on a real cluster):

    python -c "import sys; sys.path.insert(0,'/root/repo'); \
               from go_muse_spark.session import _package_zip; \
               print(_package_zip())"
    spark-submit --master local[4] --py-files <zip> tools/submit_demo.py \
        [sf_dir] [tier]

Runs the flagship muse search over the rolled-up tier of the driver
fixtures and prints the top-K result rows as JSON lines.
"""

from __future__ import annotations

import json
import sys

import numpy as np
from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # imported from the --py-files zip shipped by spark-submit
    from go_muse_spark.operators.rollup import rollup_transcripts
    from go_muse_spark.operators.search import (
        SearchParams,
        muse_search_rollup,
        series_bounds,
    )
    from go_muse_spark.sources.events import events_as_transcripts, load_table

    spark = (
        SparkSession.builder.appName("go-muse-spark-submit-demo")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    tx = events_as_transcripts(load_table(spark, sf_dir, "events"))
    rolled = rollup_transcripts(tx, "1h")
    lo, hi, n = series_bounds(rolled, 3600)
    ref = np.zeros(n)
    ref[n // 4 : n // 4 + 5] = [1.0, 3.0, 5.0, 3.0, 1.0]
    res = muse_search_rollup(
        rolled,
        ref,
        3600,
        group_by=None,
        params=SearchParams(top_n=5, max_lag=n, threshold=0.0, mode="abs"),
        series_cols=("conv_id",),
        bounds=(lo, hi, n),
    )
    for row in res.collect():
        print(json.dumps(row.asDict(), default=str))
    spark.stop()


if __name__ == "__main__":
    main()
