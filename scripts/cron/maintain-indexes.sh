#!/bin/bash
# Cron wrapper (D8 shape): maintenance-window index compaction +
# IVF vacuum. Schedule AFTER the streaming bridges quiesce — the
# compaction contract (see hygiene.compact_index) requires crashed
# epochs to replay before their rows fold into compact-*.
exec "$(dirname "${BASH_SOURCE[0]}")/run-job.sh" maintain_indexes
