"""Test harness: force an 8-device virtual CPU platform so every
sharding/collective test exercises a real multi-device mesh
(SURVEY.md §4: the multi-device simulation the reference never had).

The container's sitecustomize imports jax at interpreter startup (for the
axon TPU tunnel), so env vars are too late here — we use jax.config, which
takes effect as long as no backend has been initialized yet.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from recsys_tpu.config import MeshConfig
    from recsys_tpu.parallel.mesh import build_mesh

    return build_mesh(MeshConfig(num_data=4, num_model=2))


@pytest.fixture(scope="session")
def mesh_dp():
    from recsys_tpu.config import MeshConfig
    from recsys_tpu.parallel.mesh import build_mesh

    return build_mesh(MeshConfig(num_data=8, num_model=1))
