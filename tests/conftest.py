"""Test configuration: force an 8-device CPU mesh so multi-chip sharding
logic is exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# In this environment the JAX_PLATFORMS env var is not honored (a TPU tunnel
# plugin takes precedence); the config update below is authoritative and must
# run before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: first-compile dominates suite runtime; reruns of
# the suite (and of individual tests) hit the disk cache instead
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_kitti(tmp_path_factory):
    """A small synthetic KITTI-layout dataset shared across the session."""
    from m3dssd_tpu.data import synthetic

    root = tmp_path_factory.mktemp("kitti_data")
    # image size fits the tiny test crop (192x640); camera scales with it
    synthetic.generate(str(root), num_train=8, num_val=4, seed=3,
                       imW=624, imH=188, min_h_px=14)
    return str(root)


@pytest.fixture(scope="session")
def tiny_conf():
    """A scaled-down config (small crop, few anchors) for fast tests."""
    from m3dssd_tpu.config import kitti_3d_base

    conf = kitti_3d_base()
    return conf.replace(
        crop_size=[192, 640], test_scale=[192, 640],
        num_anchor_scales=6, batch_size=2, num_workers=2,
        back_bone="dla34", compute_dtype="float32", pre_train=False,
    )
