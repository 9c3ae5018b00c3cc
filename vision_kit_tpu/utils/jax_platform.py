"""Honor an explicit JAX_PLATFORMS override in CLI entry points.

This image's sitecustomize registers the remote-TPU ("axon") PJRT plugin in
every python process and — inside `axon.register.register()` — force-sets
`jax.config.jax_platforms = "axon,cpu"`, overriding the environment
variable. A user who launches `JAX_PLATFORMS=cpu python scripts/main.py …`
therefore still gets the tunneled TPU backend, and if the tunnel is down
the first backend touch blocks indefinitely inside the plugin's native
connect-retry loop (uninterruptible by SIGINT).

`honor_platform_env()` restores the standard JAX contract: when the
environment names a platform list WITHOUT axon (i.e. the user explicitly
opted out of the preset TPU), re-apply the env value over the registration
hook's override and deregister the axon factory so backend discovery never
dials the tunnel. When the env is unset or includes axon, this is a no-op —
the default TPU path keeps the hook's "axon,cpu" ordering (cpu is staged
for jax.debug.callback).

Same dance as tests/conftest.py and __graft_entry__.dryrun_multichip; this
is the produtionized version for scripts/main.py and scripts/demo.py.
"""

from __future__ import annotations

import os

__all__ = ["honor_platform_env", "host_cache_tag", "setup_compilation_cache"]


def host_cache_tag() -> str:
    """Cache-directory tag identifying this host's CPU capabilities.

    kernel release + arch alone is NOT enough: two VM incarnations on
    different physical CPUs can share both, and a persisted XLA:CPU AOT
    executable compiled on the other machine then loads here with
    mismatched feature sets ("Loading XLA:CPU AOT result ... could lead to
    execution errors such as SIGILL" — observed in practice with
    prefer-no-gather / avx feature diffs). Key by the actual CPU feature
    flags from /proc/cpuinfo so a different microarchitecture gets a fresh
    cache subtree.
    """
    import hashlib
    import platform as _platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line
                    break
    except OSError:
        pass
    return hashlib.md5(
        (_platform.machine() + _platform.release() + flags).encode()
    ).hexdigest()[:8]


def honor_platform_env() -> None:
    """Re-apply the JAX_PLATFORMS env var if a registration hook overrode it.

    Call before the first jax backend use (safe no-op afterwards — the
    config update only matters until a backend initializes).
    """
    env = os.environ.get("JAX_PLATFORMS")
    if not env or "axon" in env.split(","):
        return
    import jax

    try:
        jax.config.update("jax_platforms", env)
    except Exception:
        return
    try:
        from jax._src import xla_bridge as _xb

        if not _xb._backends:  # backend not yet initialized
            _xb._backend_factories.pop("axon", None)
    except Exception:
        pass


def setup_compilation_cache(base_dir: str | None = None) -> str:
    """Persistent XLA compilation cache for the CLI entry points.

    First compiles are minutes (remote compile over the TPU tunnel; or a
    single-core CPU build under JAX_PLATFORMS=cpu) — repeat train/eval/demo
    invocations should not pay that again. Same scheme as tests/conftest.py:
    the cache dir is keyed by host identity because serialized XLA:CPU
    executables from a different machine incarnation can load with
    mismatched feature sets (SIGILL). Returns the directory used.
    Override the base with VK_JAX_CACHE_DIR; entries are keyed by platform,
    so CPU and TPU runs share the tree safely.
    """
    import jax

    base = base_dir or os.environ.get(
        "VK_JAX_CACHE_DIR", os.path.join(os.getcwd(), ".jax_cache")
    )
    cache_dir = os.path.join(base, host_cache_tag())
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return cache_dir
