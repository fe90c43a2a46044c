"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh
(`--xla_force_host_platform_device_count=8`), mirroring how the driver
dry-runs the multi-chip path.

Note: this environment's sitecustomize registers a remote-TPU ("axon") PJRT
plugin and force-sets `jax_platforms` via jax.config — env vars alone are
ignored. We override through jax.config before any backend is initialized;
otherwise every tiny eager op becomes a network round-trip to the tunneled
TPU and tests crawl or hang.
"""

import os
import sys

# Persistent XLA compilation cache: the e2e tests are compile-dominated
# (minutes of XLA time for the jitted Stage-1/2 steps); cache hits make
# reruns near-instant. Keyed by platform, so sharing the dir with TPU runs
# is safe.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NB: do NOT enable the persistent compilation cache here — serializing CPU
# executables for the cache segfaults this jaxlib (put_executable_and_time
# -> SIGSEGV); the cache is TPU-only (gcdlss_tpu.utils.cache).

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
