"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native "fake backend": sharded code paths (data parallel,
sequence parallel) execute host-side on 8 virtual devices, so multi-chip
logic is exercised without hardware.  Must run before jax initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # 8 mesh partitions time-slicing few host cores: the first thread at a
    # psum/ppermute can legitimately wait (devices-1) x partition-compute,
    # which overruns XLA:CPU's default 40 s rendezvous termination timeout
    # and aborts the test process.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon TPU plugin in this image ignores JAX_PLATFORMS; force via config
# (must happen before any backend is initialized).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# XLA CPU lowers some conv shapes (e.g. 7x7/s4 patchify) to a reduced-
# precision oneDNN fast path under the default precision config (~2e-3
# relative error vs fp64 — enough to sink parity tolerances).  Parity
# tests compare exact fp32 numerics, so force full precision; production
# TPU code keeps the default (bf16 compute is the deliberate policy).
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the trainer/pipeline tests compile the
# same train-step HLO repeatedly (fresh trainer instances, suite chunks,
# reruns).  Keyed on the serialized module, so identical steps hit disk
# instead of re-running XLA:CPU optimization (~minutes each).  Disable
# with VDN_TEST_JAX_CACHE=0.
_cache = os.environ.get(
    "VDN_TEST_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
if _cache != "0":
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"
assert jax.device_count() == 8, "expected 8 virtual CPU devices"
