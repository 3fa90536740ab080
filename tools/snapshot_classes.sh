#!/bin/bash
# Snapshot compiled classes for sbt-free bench/tool runs (see
# tools/run_bench.sh): measurements never race a recompile.
cd "$(dirname "$0")/.." || exit 1
rm -rf /tmp/graft-bench/classes
mkdir -p /tmp/graft-bench
cp -r target/scala-2.13/classes /tmp/graft-bench/classes
echo "snapshot: /tmp/graft-bench/classes"
