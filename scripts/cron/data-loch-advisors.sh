#!/bin/bash
# Cron wrapper (D8): nightly upload_advisors extract — reference scripts/data-loch-advisors.sh.
exec "$(dirname "${BASH_SOURCE[0]}")/run-job.sh" upload_advisors
