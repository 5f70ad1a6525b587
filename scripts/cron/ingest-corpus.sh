#!/bin/bash
# Cron wrapper (D8 shape): raw-JSONL corpus ingest + pipeline + stats.
# Set CORPUS_SRC in the layered config to point at the landing prefix.
exec "$(dirname "${BASH_SOURCE[0]}")/run-job.sh" ingest_corpus
