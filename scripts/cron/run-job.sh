#!/bin/bash
# Shared cron spine (D8): dated log file, tee'd output, env-dispatched
# job — the shape of the reference wrappers (scripts/data-loch-*.sh),
# minus the host-specific pyenv/bash_profile bootstrap (cron provides a
# bare environment; point PYSPARK_PYTHON/PATH at your venv here).
set -uo pipefail

JOB_NAME="${1:?usage: run-job.sh <job-name>}"
cd "$(dirname "${BASH_SOURCE[0]}")/../.."

mkdir -p log
LOG=$(date +"$PWD/log/${JOB_NAME}_%Y-%m-%d.log")
LOGIT="tee -a $LOG"

{
  echo
  echo "------------------------------------------"
  echo "$(date): About to run the ${JOB_NAME} job..."
} | $LOGIT

JOB="$JOB_NAME" python -m jonesy_spark 2>&1 | $LOGIT
exit "${PIPESTATUS[0]}"
