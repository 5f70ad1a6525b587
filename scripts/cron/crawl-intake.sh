#!/bin/bash
# Cron wrapper (D8 shape): nightly crawl intake — WARC archives through
# extraction, the Gopher gate, and digest dedup into the novel gated
# corpus (+ quarantine + manifest); the batch twin of the intake stream.
exec "$(dirname "${BASH_SOURCE[0]}")/run-job.sh" crawl_intake
