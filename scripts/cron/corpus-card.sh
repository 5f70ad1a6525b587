#!/bin/bash
# Cron wrapper (D8 shape): nightly per-source data card emit + upload.
exec "$(dirname "${BASH_SOURCE[0]}")/run-job.sh" corpus_card
