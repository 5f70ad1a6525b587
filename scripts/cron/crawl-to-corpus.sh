#!/bin/bash
# Cron wrapper (D8 shape): the composed raw-bytes-to-training-shards
# run — WARC archives through the intake composition (parse, extract,
# gate, digest dedup) and straight into the corpus pipeline (dedup,
# mixture, split, pack) with per-boundary counts in the manifest.
exec "$(dirname "${BASH_SOURCE[0]}")/run-job.sh" crawl_to_corpus
