"""Test config: force an 8-device virtual CPU mesh (idiomatic JAX substitute
for multi-chip testing; see SURVEY.md §4)."""

import os

# force-override: the environment may pin JAX_PLATFORMS to a TPU plugin
os.environ["JAX_PLATFORMS"] = "cpu"
# fail fast instead of retrying network fetches (loaders fall back offline)
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("HF_DATASETS_OFFLINE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the TPU plugin's sitecustomize pins jax_platforms via config, not just env;
# override it the same way (before any backend is initialized)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
