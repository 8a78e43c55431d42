"""Volume FEM Helmholtz engine.

Counterpart of the reference crate ``math-fem`` (SURVEY.md §2.4). TPU
architecture: meshes are generated and analyzed on host (numpy, flat
arrays only — mesh/types.rs and mesh/generators.rs are pointer-light
already), while assembly and solves run on device:

- element matrices via one vmapped kernel over all elements (replaces
  the rayon element loops of assembly/stiffness.rs:298),
- global assembly via a single scatter-add into a *fixed* CSR/ELL
  sparsity shared across the frequency sweep (the HelmholtzAssembler
  trick, assembly/assembler.rs:19-44, which is already TPU-shaped),
- per-frequency system values are one fused elementwise combine
  K - k^2 M + sum(coeff_tag * B_tag), vmappable over k.
"""

from mathaudio_tpu.fem.mesh import (  # noqa: F401
    Mesh,
    rectangular_mesh_triangles,
    rectangular_mesh_quads,
    box_mesh_tetrahedra,
    box_mesh_hexahedra,
    circular_mesh_triangles,
    annular_mesh_triangles,
    spherical_shell_mesh_tetrahedra,
    unit_square_triangles,
    unit_square_quads,
    unit_cube_tetrahedra,
    unit_cube_hexahedra,
)
from mathaudio_tpu.fem.basis import element_tables  # noqa: F401
from mathaudio_tpu.fem.assembly import (  # noqa: F401
    assemble_stiffness_mass,
    assemble_lumped_mass,
    assemble_boundary_mass,
    assemble_rhs,
    HelmholtzAssembler,
)
from mathaudio_tpu.fem.boundary import DirichletBC, RobinBC, NeumannBC  # noqa: F401
from mathaudio_tpu.fem.problem import HelmholtzProblem, solve_helmholtz  # noqa: F401
