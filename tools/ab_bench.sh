#!/bin/bash
# Same-window A/B bench: alternate the round-11 tag worktree and the
# current tree (VERDICT r11 #5 / d1a7679 method) so host drift hits both
# sides equally. Usage: tools/ab_bench.sh <r11_tree> <out_prefix> [n_pairs]
set -u
R11="${1:?r11 worktree}"; OUT="${2:?out prefix}"; N="${3:-2}"
export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"
for i in $(seq 1 "$N"); do
  (cd "$R11" && python bench.py 2>/dev/null) > "${OUT}_r11_$i.json"
  (cd /root/repo && python bench.py 2>/dev/null) > "${OUT}_r12_$i.json"
done
python3 - "$OUT" "$N" <<'EOF'
import json, sys
out, n = sys.argv[1], int(sys.argv[2])
for side in ("r11", "r12"):
    for i in range(1, n + 1):
        d = json.load(open(f"{out}_{side}_{i}.json"))
        print(side, i, "total:", d["value"], "polluted:", d["polluted"],
              "steal:", d.get("steal_pct"),
              "probe:", d.get("cpu_probe_sec"))
EOF
