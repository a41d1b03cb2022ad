"""Capture a jax profiler trace of the full scan and print top ops."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cnf2freq_tpu.config import ModelConfig, RuntimeParams
from cnf2freq_tpu.engine import chromosome_scan
from cnf2freq_tpu.hmm.family import gather_family
from cnf2freq_tpu.utils import simulate_f2

B, M = 1000, 192
ped = simulate_f2(n_f2=B, n_markers=M, n_founder_pairs=max(1, B // 50), seed=7)
for ind in ped.inds[1:]:
    ped.fixtrees(ind.n)
ped.count_descendants()
fb = gather_family(ped, ped.dous, 0, ped.num_markers - 1, dtype=np.float32)
dists = np.diff(ped.markerposes).astype(np.float32)
cfg = ModelConfig()
params = RuntimeParams()
fbj = fb.map(jnp.asarray)
dj = jnp.asarray(dists)


@jax.jit
def step(fb, d):
    out = chromosome_scan(fb, d, cfg, params)
    return sum(jnp.sum(x).astype(jnp.float32)
               for x in jax.tree_util.tree_leaves(out))


_ = float(np.asarray(step(fbj, dj)))

tdir = "/tmp/jax_trace"
os.system(f"rm -rf {tdir}")
jax.profiler.start_trace(tdir)
for _ in range(3):
    s = float(np.asarray(step(fbj, dj)))
jax.profiler.stop_trace()

# parse the trace: accumulate device-side op durations
files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
agg = defaultdict(float)
cnt = defaultdict(int)
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    pid_names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            pname = pid_names.get(ev.get("pid"), "")
            if "TPU" in pname or "tpu" in pname or "/device" in pname.lower():
                agg[ev["name"]] += ev["dur"]
                cnt[ev["name"]] += 1
top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
tot = sum(agg.values())
print(f"total device us: {tot:,.0f}")
for name, us in top:
    print(f"{us/3:12,.0f} us/step  x{cnt[name]:3d}  {name[:110]}")
