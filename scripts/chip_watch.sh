#!/bin/bash
# Poll TPU backend health until it recovers, then write /tmp/chip_back.txt.
# Background Bash tasks lose the axon plugin unless PYTHONPATH carries the
# plugin site (CLAUDE.md "Environment facts"), so set it explicitly here.
export PYTHONPATH="/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
rm -f /tmp/chip_back.txt
while true; do
  # 600 s bound: post-recovery first device ops have measured 130-480+ s
  # (CLAUDE.md "Recovery (r5 session 2)"); 150 s produced false negatives.
  if timeout 600 python - <<'EOF' >/tmp/chip_probe.log 2>&1
import jax, jax.numpy as jnp
assert any(d.platform != "cpu" for d in jax.devices())
print(float(jnp.sum(jnp.ones(4))))
EOF
  then
    date -u +"%Y-%m-%dT%H:%M:%SZ chip healthy" > /tmp/chip_back.txt
    echo "chip back: $(cat /tmp/chip_back.txt)"
    exit 0
  fi
  date -u +"%Y-%m-%dT%H:%M:%SZ probe failed" >> /tmp/chip_watch.log
  sleep 120
done
