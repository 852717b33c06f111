#!/bin/bash
# Streaming throughput datapoint (SCALE.md "Streaming"): rate source →
# StreamingOps.bucketMean and dedupDocsNear, noop sink, median
# processedRowsPerSecond. Tune with SPARK_GRAFT_STREAM_RPS /
# SPARK_GRAFT_STREAM_SECS.
cd "$(dirname "$0")/.." || exit 1
exec sbt -batch "runMain graft.StreamingBench" "$@"
