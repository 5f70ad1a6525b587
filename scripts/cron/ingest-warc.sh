#!/bin/bash
# Cron wrapper (D8 shape): WARC crawl-archive front door — archives
# under $WARC_SRC (or seeded fixtures) through the per-archive
# quarantine walker into the documents parquet contract + manifest.
exec "$(dirname "${BASH_SOURCE[0]}")/run-job.sh" ingest_warc
