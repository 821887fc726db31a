#!/usr/bin/env bash
set -u
cd /root/repo
rm -rf /root/graft-classes-snap
cp -a target/scala-2.13/classes /root/graft-classes-snap
GRAFT_SNAP_CP=/root/graft-classes-snap GRAFT_BLESS_COMMIT=$(git rev-parse HEAD) tools/bench_clean.sh 210
