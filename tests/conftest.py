"""Test config: force a virtual 8-device CPU mesh before JAX initializes.

This is the JAX-native way to test multi-chip sharding without hardware
(SURVEY.md §4): all tests run on CPU with 8 virtual devices, so pjit/shard_map
paths exercise real collectives.

NOTE: on this machine the `JAX_PLATFORMS` env var is overridden by the axon
TPU plugin, so we must ALSO call jax.config.update — otherwise every tiny test
tunnels to the real TPU chip (slow, and TPU f32 transcendentals have larger
error than CPU).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# ---------------------------------------------------------------------------
# slow-test marking: `pytest -m "not slow"` is the quick default (<3 min);
# the full suite (~30 min: ResNet-50 inits, CLI train loops) runs in CI /
# before release. Durations measured on this box, tests/ @ r2.
# ---------------------------------------------------------------------------

SLOW_MODULES = {
    "test_maskrcnn",         # ResNet-50 detector inits (280 s fixture)
    "test_cli_integration",  # full train->eval->bop->inference loops
    "test_graft_entry",      # driver entry + 8-device dryrun compile
    "test_serving",          # AOT server compiles
    "test_train_step",       # data-parallel train steps
    "test_yolov4",           # darknet body compiles
    "test_model",            # full ResNet-50 init in the module fixture
    # the two kept-for-reference Pallas kernels (production path is 'sep')
    "test_deform_attn_pallas",
    "test_deform_attn_pallas_v2",
    "test_tensor_parallel",  # dp x tp train steps on the 8-device mesh
    "test_full_model_parity",  # builds the torch reference PoET end-to-end
}
SLOW_TESTS = {
    "test_poet_conversion_merges_into_model",  # 54 s full converted-model apply
    "test_loss_and_gradients",
    "test_backbone_mode_matches_oracle_random",
    "test_random_many",
    "test_load_backbone_weights_end_to_end",
    "test_zoo_checkpoint_converter_roundtrip",
    "test_gradients_match_multi_tile",
    # thorough-parity additions (edge-geometry fuzz + custom-VJP gradient
    # checks) — exact but ~60 s combined; full-suite material
    "test_edge_shapes_all_formulations",
    "test_gradients_chunked",
    "test_gradients_match_xla_autodiff",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        name = item.name.split("[")[0]
        if mod in SLOW_MODULES or name in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
