#!/bin/bash
# Round-4 TPU measurement orchestrator.
#
# The axon tunnel is single-client: every stage runs as its OWN process,
# strictly sequentially, with quiet gaps between exits so the remote side
# releases the claim cleanly. A TPU client is NEVER killed (no `timeout`
# around TPU processes — killing one mid-compile wedges the remote side
# for 5-10+ min); instead a LAUNCH deadline gates whether the next stage
# may start, so a dead relay can't make this session collide with the
# driver's end-of-round bench.py run.
#
# Usage: nohup bash scripts/tpu_measure_r4.sh > /root/repo/tpu_r4.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

DEADLINE=$(( $(date +%s) + 21600 ))  # stop LAUNCHING new stages after 6h
# loopback-relay plugin scheme: the classic pool-svc port 10000 is not in
# play (a healthy tunnel refuses it) — treat the relay as up and let the
# python-side bounded init checks do the real probing
relay_up() { [ -n "${AXON_LOOPBACK_RELAY:-}" ] || \
  timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/10000' 2>/dev/null; }
may_launch() { [ "$(date +%s)" -lt "$DEADLINE" ] && relay_up; }

echo "[orch] start $(date -u +%H:%M:%S)"

# Bounded relay wait in BASH (no TPU client exists yet, safe to abandon)
while ! relay_up; do
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "[orch] relay never returned before the deadline; giving up"
    exit 1
  fi
  sleep 60
done
echo "[orch] relay up $(date -u +%H:%M:%S)"

# Stage A: kernel probes + TIMIT/LVCSR/streaming benches
python scripts/tpu_measure_r4.py
echo "[orch] stage A rc=$? $(date -u +%H:%M:%S)"
sleep 120

# Stage B: the exact driver bench path, end to end (VERDICT r3 #1b:
# BENCH_r04 must parse; this catches surprises before the driver runs it)
if may_launch; then
  BENCH_MAX_WAIT=900 BENCH_MAX_RETRIES=3 \
    python bench.py > /root/repo/tpu_r4_bench.log 2>&1
  echo "[orch] stage B rc=$? $(date -u +%H:%M:%S)"
  tail -1 /root/repo/tpu_r4_bench.log
  sleep 120
fi

# Stage C: CLI epoch-1 compile tax, cold then warm persistent cache
# (VERDICT r3 #5: document the epoch-1 improvement from the overlapped
# whole-epoch compile; round-3 baseline was 293 s warm / ~1400 s cold)
CACHE=/root/repo/.xla_cache_r4
rm -rf "$CACHE"   # 'cold' must really be cold, even on orchestrator reruns
DATA=/root/repo/examples/alignments
for tag in cold warm; do
  if may_launch && [ -f "$DATA/timit_trainD117.nc" ]; then
    RUN=$(mktemp -d)
    (cd "$RUN" && \
      python -m lstm_rnn_tpu.cli \
        /root/repo/examples/phoneme_recognition_timit/config.cfg \
        --train_file "$DATA/timit_trainD117.nc" \
        --val_file "$DATA/timit_cvD117.nc" \
        --max_epochs 3 --bucket_lengths single --fuse_fractions 32 \
        --compilation_cache_dir "$CACHE" \
        > "/root/repo/tpu_r4_epoch_${tag}.log" 2>&1)
    echo "[orch] stage C($tag) rc=$? $(date -u +%H:%M:%S)"
    grep -E "^ *[0-9]+ \|" "/root/repo/tpu_r4_epoch_${tag}.log" | head -4
    sleep 120
  fi
done

echo "[orch] DONE $(date -u +%H:%M:%S)"
