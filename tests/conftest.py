"""Test configuration: run everything on CPU with a virtual 8-device mesh so
multi-chip sharding paths compile and execute without TPU hardware.

ECCOXIDE_COMPACT_GRAPHS=1 switches the field engine's schoolbook product to
a single depthwise-conv op and the carry passes to their stacked form
(field.py _COMPACT): numerically identical integer arithmetic, ~4x faster
XLA:CPU compiles (the SSA form that is fast on TPU makes CPU test compiles
take tens of minutes). tests/test_field.py::test_compact_vs_ssa_forms
cross-checks the two forms; the TPU bench checks the SSA form end-to-end."""

import os
import sys

os.environ.setdefault("ECCOXIDE_COMPACT_GRAPHS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/eccoxide_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
