"""honor_platform_env: an explicit JAX_PLATFORMS override beats the axon
registration hook's config force (utils/jax_platform.py)."""

import jax

from vision_kit_tpu.utils.jax_platform import honor_platform_env


def test_env_without_axon_wins(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    jax.config.update("jax_platforms", "axon,cpu")  # simulate the hook
    try:
        honor_platform_env()
        assert jax.config.jax_platforms == "cpu"
    finally:
        jax.config.update("jax_platforms", "cpu")


def test_env_with_axon_is_noop(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    jax.config.update("jax_platforms", "axon,cpu")
    try:
        honor_platform_env()
        assert jax.config.jax_platforms == "axon,cpu"  # hook's value kept
    finally:
        jax.config.update("jax_platforms", "cpu")


def test_env_unset_is_noop(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    jax.config.update("jax_platforms", "axon,cpu")
    try:
        honor_platform_env()
        assert jax.config.jax_platforms == "axon,cpu"
    finally:
        jax.config.update("jax_platforms", "cpu")
