"""Surface BEM Helmholtz engine.

Counterpart of the reference crate ``math-bem`` (SURVEY.md §2.5 — itself
a port of the C++ NumCalc/Mesh2HRTF solver). TPU architecture:

- constant-element collocation as *one batched pairwise kernel*: the
  O(N^2) double element loop of tbem.rs:96-222 becomes a broadcasted
  evaluation of the fused Green-kernel family (wave.special.all_kernels_3d)
  over (collocation point x quadrature point) grids — dense, static
  shapes, MXU/VPU-friendly; adaptive quadrature order becomes fixed
  order + masking, and the singular self-terms use a static polar
  subdivision tensor (integration/singular.rs:123's adaptive subdivision
  made static),
- Burton–Miller coupling with the reference's beta variants,
- solves via dense LU (real embedding) or GMRES,
- Kirchhoff–Helmholtz field evaluation as a second pairwise kernel.
"""

from mathaudio_tpu.bem.types import (  # noqa: F401
    PhysicsParams,
    BCType,
    BemMethod,
    BoundaryCondition,
    SolverMethod,
    BemSolverConfig,
)
from mathaudio_tpu.bem.mesh import (  # noqa: F401
    SurfaceMesh,
    icosphere,
    uv_sphere,
    cylinder_mesh,
)
from mathaudio_tpu.bem.incident import IncidentField, plane_wave, point_source  # noqa: F401
from mathaudio_tpu.bem.assembly import (  # noqa: F401
    assemble_collocation_matrix,
    assemble_burton_miller,
    assemble_mixed_system,
)
from mathaudio_tpu.bem.solver import BemProblem, BemSolver, BemSolution  # noqa: F401
from mathaudio_tpu.bem.postprocess import (  # noqa: F401
    FieldResult,
    evaluate_field,
    generate_line_eval_points,
    generate_plane_eval_points,
    generate_sphere_eval_points,
)
from mathaudio_tpu.bem.fmm import (  # noqa: F401
    ClusterBlockPreconditioner,
    build_mlfmm_system,
    build_mlfmm_tree_mixed_system,
    build_mlfmm_tree_system,
    build_room_fmm_system,
    build_slfmm_mixed_system,
    build_slfmm_system,
    gather_form,
    sel_form,
    near_ilu_preconditioner,
)
from mathaudio_tpu.bem.fmm_chip import (  # noqa: F401
    fmm_chip_matvec_fn,
    fmm_chip_solve_fn,
    join_planes,
    split_planes,
)
