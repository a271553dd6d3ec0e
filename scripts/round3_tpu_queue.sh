#!/bin/bash
# Round-3 TPU measurement queue — run ONE at a time (the v5e-1 chip's
# 16GB HBM cannot host two processes; see CLAUDE.md). Each step logs to
# /tmp/r3q_*.log and continues past failures so one flaky tunnel window
# doesn't kill the whole queue.
set -u
cd /root/repo

run() {
    tag=$1; shift
    echo "=== $tag: $* ($(date))"
    timeout 3600 "$@" >"/tmp/r3q_${tag}.log" 2>&1
    echo "=== $tag exit=$? ($(date)); tail:"
    tail -3 "/tmp/r3q_${tag}.log"
}

run entry     python __graft_entry__.py
run distill   python scripts/distill_scaffold.py
run scaffold8 python scripts/scaffold_ab.py --steps 8
run spec      python scripts/bench_speculative.py
run bench     python bench.py
