#!/bin/bash
# Opportunistic TPU measurement battery for a flaky tunnel: retries each
# step until it succeeds (marker file), in priority order.  Run from
# /root/repo.  Logs under /tmp/battery/.
mkdir -p /tmp/battery
cd /root/repo

probe() {
  timeout 90 python -u -c "
import jax, jax.numpy as jnp
print('probe-ok', float(jnp.sum(jnp.ones((4,)))))" 2>/dev/null | grep -q probe-ok
}

run_step() {
  local name="$1"; shift
  local tmo="$1"; shift
  local marker="/tmp/battery/${name}.done"
  [ -f "$marker" ] && return 0
  echo "[battery] step $name ..." >> /tmp/battery/driver.log
  if timeout "$tmo" "$@" > "/tmp/battery/${name}.log" 2>&1; then
    touch "$marker"
    echo "[battery] step $name DONE" >> /tmp/battery/driver.log
    return 0
  fi
  echo "[battery] step $name failed/timeout" >> /tmp/battery/driver.log
  return 1
}

for attempt in $(seq 1 200); do
  echo "[battery] attempt $attempt $(date +%H:%M:%S)" >> /tmp/battery/driver.log
  if ! probe; then
    sleep 120
    continue
  fi
  run_step smoke_track 900 python -u smoke_trackloss.py || continue
  run_step prof_color 900 python -u tools_profile_map.py "=color u8 comp" || continue
  run_step prof_geo 900 python -u tools_profile_map.py "=geometry u8 comp" || continue
  run_step scatter 600 python -u tools_profile_scatter.py || continue
  run_step bench 2400 python -u bench.py || continue
  run_step ablate_ref 3600 python -u tools_ablate.py ref_semantics || continue
  run_step qm_base 1800 python -u tools_quality_matrix.py noisy_base || continue
  run_step qm_noexpo 1800 python -u tools_quality_matrix.py noisy_no_exposure || continue
  run_step qm_ba 1800 python -u tools_quality_matrix.py noisy_ba || continue
  run_step qm_loop 1800 python -u tools_quality_matrix.py loop_endcorr || continue
  run_step qm_noloop 1800 python -u tools_quality_matrix.py loop_no_endcorr || continue
  echo "[battery] ALL DONE" >> /tmp/battery/driver.log
  break
done
