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

__all__ = ["honor_platform_env"]


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
