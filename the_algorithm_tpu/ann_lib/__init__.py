"""Generic ANN library: typed index API, brute-force & clustered-scan
implementations, loadtest harness."""

from the_algorithm_tpu.ann_lib.index import (  # noqa: F401
    BruteForceIndex,
    ClusteredScanIndex,
    Metric,
)
from the_algorithm_tpu.ann_lib.loadtest import LoadTestRecorder, run_loadtest  # noqa: F401
