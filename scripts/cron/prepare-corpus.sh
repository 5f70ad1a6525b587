#!/bin/bash
# Cron wrapper (D8 shape): nightly training-corpus preparation pipeline.
exec "$(dirname "${BASH_SOURCE[0]}")/run-job.sh" prepare_corpus
