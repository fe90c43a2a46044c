"""Persistent XLA compilation cache setup.

On this rig the `JAX_COMPILATION_CACHE_DIR` environment variable is
ineffective: the site's TPU plugin initializes jax.config before user env
vars are consulted, so the cache silently never materializes and every
process pays multi-minute remote compiles for the big sparse-UNet programs.
Setting the config keys through `jax.config.update` after `import jax`
works. Call `enable_compile_cache()` from every entry point before the
first jit execution.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compile_cache(path: str | None = None) -> str | None:
    import jax

    # Honor a JAX_PLATFORMS env pin BEFORE touching the backend registry:
    # this rig's sitecustomize force-sets `jax_platforms` through jax.config
    # (silently overriding the env var), so `jax.default_backend()` under
    # `JAX_PLATFORMS=cpu` still initializes the remote-TPU plugin — and
    # blocks retrying a dead tunnel for 10+ minutes. Re-asserting the pin
    # through jax.config (the conftest recipe) keeps CPU-pinned entry points
    # off the tunnel entirely.
    want = os.environ.get("JAX_PLATFORMS", "")
    if want and not any(p in want for p in ("tpu", "axon")):
        jax.config.update("jax_platforms", want)
        return None

    if jax.default_backend() != "tpu":
        # serializing CPU executables for the cache segfaults this jaxlib
        # (observed: put_executable_and_time -> SIGSEGV under pytest); the
        # cache only pays off for the remote-compiled TPU programs anyway
        return None
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path
