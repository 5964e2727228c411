#!/bin/bash
# Round-5 bench campaign: spaced runs with same-minute CPU calibration so
# each bench JSON carries evidence of its window quality.
cd /root/repo
for i in 1 2 3 4; do
  cal=$(PYTHONPATH=/root/repo python - <<'PY' 2>/dev/null
import importlib.util
spec = importlib.util.spec_from_file_location('bs','scripts/bench_scaling.py')
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
c4, c16 = m.calibrate(4), m.calibrate(16)
print(round(c16/c4/4, 3))
PY
)
  echo "{\"run\": $i, \"ts\": \"$(date -u +%FT%TZ)\", \"cal_4to16\": $cal}" >> BENCH/campaign_r5.jsonl
  timeout 900 python bench.py 2>/dev/null | tail -1 >> BENCH/campaign_r5.jsonl
  sleep 240
done
echo CAMPAIGN-DONE >> BENCH/campaign_r5.jsonl
