#!/bin/bash
# Cron wrapper (D8): nightly upload_snapshot extract — reference scripts/data-loch-snapshot.sh.
exec "$(dirname "${BASH_SOURCE[0]}")/run-job.sh" upload_snapshot
