"""Pallas TPU kernels for the hot compute paths.

The XLA-generated code for most of this framework is already fused and
MXU-bound; this package holds hand-written kernels where explicit tiling
and VMEM control win over XLA's defaults:

- bem_assembly: the O(N^2 x quadrature) pairwise Green-kernel assembly,
  tiled over (collocation x element) blocks with the quadrature loop kept
  in VMEM (the single hottest op of the dense BEM path).

Every kernel has an identical-semantics XLA fallback. Since round 4 the
DEFAULT is the row-chunked XLA assembly — it beat the kernels in the
driver-reproducible A/B once row-chunking removed the (N, N, nq)
materialization the kernels existed to avoid (N=5120: XLA 89.5 vs
Pallas 103.3 ms; N=20480: 254.3 vs 274.7; `bench.py --metric bem
--ab-pallas`). The kernels stay tested and opt-in (``MATHAUDIO_PALLAS=1``
or ``force='pallas'``) as the record of when explicit tiling wins:
against ONE-SHOT assembly they measured 2.53x and ran tiers XLA OOMed on.
"""

from mathaudio_tpu.ops.bem_assembly import (  # noqa: F401
    pairwise_bm,
    pairwise_bm_xla,
    pairwise_double_layer,
    pairwise_double_layer_xla,
    pairwise_kh,
    pairwise_kh_xla,
)
