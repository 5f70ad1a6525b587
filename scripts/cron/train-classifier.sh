#!/bin/bash
# Cron wrapper (D8 shape): nightly quality-classifier retrain + publish.
exec "$(dirname "${BASH_SOURCE[0]}")/run-job.sh" train_classifier
