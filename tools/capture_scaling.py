"""Capture SCALING_r*.json from __graft_entry__.weak_scaling.

Runs the sharded batched-verify weak-scaling harness on the 8-device
virtual CPU mesh (compact graphs). On virtual devices the efficiency
number validates harness + collective structure only; real efficiency
needs a multi-chip TPU slice (BASELINE.md north star: >= 85%).

Usage: python tools/capture_scaling.py [out.json] [n_devices] [b_per_dev]
"""

import json
import os
import sys

os.environ.setdefault("ECCOXIDE_COMPACT_GRAPHS", "1")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax  # noqa: E402

N = int(sys.argv[2]) if len(sys.argv) > 2 else 8
jax.config.update("jax_num_cpu_devices", N)
jax.config.update("jax_compilation_cache_dir", "/tmp/eccoxide_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

from __graft_entry__ import weak_scaling  # noqa: E402

out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING_r04.json"
bpd = int(sys.argv[3]) if len(sys.argv) > 3 else 16

res = weak_scaling(N, b_per_device=bpd)
rec = {
    "harness": "weak_scaling (sharded batched Ed25519 verify, dp mesh)",
    "backend": jax.default_backend(),
    "n_devices": N,
    "b_per_device": bpd,
    **res,
    "note": ("virtual CPU mesh: validates mesh/collective structure and "
             "that the step executes sharded; the efficiency value is "
             "only meaningful on real multi-chip hardware"),
}
with open(out_path, "w") as fh:
    json.dump(rec, fh, indent=1)
print(json.dumps(rec))
