#!/bin/bash
# Cron wrapper (D8 shape): nightly BPE vocabulary training + publish.
exec "$(dirname "${BASH_SOURCE[0]}")/run-job.sh" train_tokenizer
