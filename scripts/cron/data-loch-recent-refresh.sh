#!/bin/bash
# Cron wrapper (D8): nightly upload_recent_refresh extract — reference scripts/data-loch-recent-refresh.sh.
exec "$(dirname "${BASH_SOURCE[0]}")/run-job.sh" upload_recent_refresh
