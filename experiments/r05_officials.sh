#!/bin/sh
# Round-5 official per-world refresh: bench.py --world K (720p, 1024 spp),
# one process per world, sequential so each gets the chip alone.
# World 3 measured separately this session (2184.1); included again for a
# same-batch confirmation.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
for w in 1 2 3 4 5 6 7; do
  echo "=== world $w ==="
  timeout 2400 python bench.py --world "$w" 2>&1 | grep -v '^WARNING' | tail -2
done
echo "ALL DONE"
