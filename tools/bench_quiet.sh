#!/bin/bash
# Run bench.py after waiting for a low-steal window (BENCH_NOTES_r12 protocol):
# poll /proc/stat until an 8-s window shows steal delta < 120 ticks, then run.
for i in $(seq 1 90); do
  a=$(awk '/^cpu /{print $9}' /proc/stat); sleep 8
  b=$(awk '/^cpu /{print $9}' /proc/stat)
  d=$((b-a)); echo "window $i: steal=$d" >&2
  if [ "$d" -lt 120 ]; then break; fi
done
exec python bench.py
