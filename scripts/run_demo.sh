#!/bin/sh
# Launcher parity with the reference's scripts/run.sh (mvn package +
# hadoop fs staging + two XmlExtractor jobs): run_demo.py performs the
# same stage -> pack -> ExtractInventory -> ExtractBook -> cat sequence
# on Spark. Extra args pass through (workdir, --streaming).
cd "$(dirname "$0")/.." || exit 1
PYTHONPATH=. exec python scripts/run_demo.py "$@"
