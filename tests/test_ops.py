"""Pallas kernels vs XLA references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mathaudio_tpu.bem import icosphere
from mathaudio_tpu.ops.bem_assembly import (
    pairwise_double_layer_pallas,
    pairwise_double_layer_xla,
)


class TestBemAssemblyKernel:
    def test_matches_xla(self):
        mesh = icosphere(1.0, 2)
        qp, qw = mesh.quad_points(3)
        x = jnp.asarray(mesh.centers)
        yq = jnp.asarray(qp)
        ny = jnp.asarray(mesh.normals)
        w = jnp.asarray(qw)
        k = 1.5
        dk_x, d0_x = pairwise_double_layer_xla(x, yq, ny, w, k)
        dk_p, d0_p = pairwise_double_layer_pallas(x, yq, ny, w, k)
        np.testing.assert_allclose(np.asarray(dk_p), np.asarray(dk_x), atol=1e-12)
        np.testing.assert_allclose(np.asarray(d0_p), np.asarray(d0_x), atol=1e-12)

    def test_padding_is_harmless(self):
        # N not a multiple of the tile: padded elements must not leak
        mesh = icosphere(1.0, 2)
        qp, qw = mesh.quad_points(3)
        sel = slice(0, 300)  # 300 is not a multiple of 128
        x = jnp.asarray(mesh.centers[sel])
        yq = jnp.asarray(qp[sel])
        ny = jnp.asarray(mesh.normals[sel])
        w = jnp.asarray(qw[sel])
        dk_p, _ = pairwise_double_layer_pallas(x, yq, ny, w, 2.0)
        dk_x, _ = pairwise_double_layer_xla(x, yq, ny, w, 2.0)
        assert dk_p.shape == (300, 300)
        np.testing.assert_allclose(np.asarray(dk_p), np.asarray(dk_x), atol=1e-12)
