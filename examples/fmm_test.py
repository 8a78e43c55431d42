"""FMM test: SLFMM and MLFMM matvecs vs the dense operator.

Analog of math-bem/examples/fmm_test.rs ("Verifies that SLFMM and MLFMM
matvec implementations produce correct results"): random complex
vectors through all three operators on one mesh at two wavenumbers,
reporting the relative matvec error of each FMM tier against the dense
collocation matrix. Companion to fmm_validation.py (which gates the
Burton-Miller SLFMM); this one exercises the plain-CBIE tier triple
the way the reference example does.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mathaudio_tpu.bem.assembly import assemble_collocation_matrix  # noqa: E402
from mathaudio_tpu.bem.fmm import (  # noqa: E402
    build_mlfmm_system,
    build_mlfmm_tree_system,
    build_slfmm_system,
)
from mathaudio_tpu.bem.mesh import icosphere  # noqa: E402

rng = np.random.default_rng(7)
mesh = icosphere(1.0, 3)
n = mesh.num_elements
print(f"mesh: {n} elements")

for k in (2.0, 4.0):
    a = np.asarray(assemble_collocation_matrix(mesh, k))
    rels = {}
    for name, build in (
        ("slfmm", build_slfmm_system),
        ("mlfmm-2lvl", build_mlfmm_system),
        ("mlfmm-tree", build_mlfmm_tree_system),
    ):
        op = build(mesh, k)
        errs = []
        for _ in range(3):
            x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
            y_ref = a @ x
            y = np.asarray(op.matvec(jnp.asarray(x)))
            errs.append(np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref))
        rels[name] = max(errs)
    print(
        f"ka={k}: "
        + "  ".join(f"{name} rel={rel:.2e}" for name, rel in rels.items())
    )
    for name, rel in rels.items():
        # reference gate is rel < 0.5 (test_fmm_validation.rs:142);
        # this build holds orders of magnitude tighter
        assert rel < 5e-2, (name, rel)
print("OK: all FMM tiers reproduce the dense matvec")
