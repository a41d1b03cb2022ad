#!/bin/sh
# Poll the axon tunnel; on recovery run the TPU validation battery.
# One jax process at a time (exclusive tunnel).
cd /root/repo
for i in $(seq 1 100); do
  if timeout 120 python -c "import jax, jax.numpy as jnp; jnp.ones(2).sum().block_until_ready()" >/dev/null 2>&1; then
    echo "TUNNEL RECOVERED attempt $i $(date)"
    echo "=== bench.py ==="
    timeout 1200 python bench.py 2>/tmp/recovery_bench_err.log
    echo "EXIT=$?"
    echo "=== driver_iter ==="
    timeout 1200 python bench/driver_iter.py 2>/dev/null
    echo "EXIT=$?"
    echo "=== verify f32 CLI ==="
    cd /tmp && timeout 1200 env PYTHONPATH=/root/repo:/root/.axon_site \
      python -m cnf2freq_tpu \
      --mapfile /root/reference/demoplantimpute.map \
      --pedfile /root/reference/demoplantimpute.ped \
      --genfile /root/reference/demoplantimpute.gen \
      --count 10 --f32 --output /tmp/recovery_verify_out >/dev/null 2>&1
    echo "EXIT=$?"
    exit 0
  fi
  sleep 300
done
echo "tunnel never recovered $(date)"
exit 3
