"""Pallas TPU kernels for the hot compute paths.

The XLA-generated code for most of this framework is already fused and
MXU-bound; this package holds hand-written kernels where explicit tiling
and VMEM control win over XLA's defaults:

- bem_assembly: the O(N^2 x quadrature) pairwise Green-kernel assembly,
  tiled over (collocation x element) blocks with the quadrature loop kept
  in VMEM (the single hottest op of the dense BEM path).

Every kernel has an identical-semantics XLA fallback; the public entry
points select Pallas on TPU f32 and fall back elsewhere (opt out with
``MATHAUDIO_PALLAS=0``).
"""

from mathaudio_tpu.ops.bem_assembly import (  # noqa: F401
    pairwise_bm,
    pairwise_bm_xla,
    pairwise_double_layer,
    pairwise_double_layer_xla,
    pairwise_kh,
    pairwise_kh_xla,
)
