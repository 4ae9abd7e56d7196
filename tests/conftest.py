"""Test config: force an 8-device virtual CPU mesh (idiomatic JAX substitute
for multi-chip testing; see SURVEY.md §4).

On-chip lane: ``KVZIP_TPU_TESTS=1 pytest -n 0 -m tpu tests/`` keeps the real
backend and runs each Pallas kernel compiled+executed with parity-vs-jnp on
small shapes (catches Mosaic regressions the CPU interpret tests cannot).
"""

import os

TPU_LANE = os.environ.get("KVZIP_TPU_TESTS") == "1"

if not TPU_LANE:
    # force-override: the environment may pin JAX_PLATFORMS to a TPU plugin
    os.environ["JAX_PLATFORMS"] = "cpu"
# fail fast instead of retrying network fetches (loaders fall back offline)
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("HF_DATASETS_OFFLINE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

if TPU_LANE and os.environ.get("PYTEST_XDIST_WORKER"):
    raise RuntimeError(
        "the on-chip lane must run single-process (one TPU client per "
        "tunnel): KVZIP_TPU_TESTS=1 python -m pytest -n 0 -m tpu ...")

import jax  # noqa: E402

if not TPU_LANE:
    # the TPU plugin's sitecustomize pins jax_platforms via config, not just
    # env; override it the same way (before any backend is initialized)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
else:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_collection_modifyitems(config, items):
    import pytest

    # run the multi-device tests FIRST (fresh XLA state — see note above)
    items.sort(key=lambda it: 0 if "test_parallel" in it.nodeid else 1)
    if TPU_LANE:
        # on-chip lane runs ONLY the tpu-marked kernel tests
        skip = pytest.mark.skip(reason="on-chip lane runs -m tpu tests only")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(reason="needs KVZIP_TPU_TESTS=1 + a TPU")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)
