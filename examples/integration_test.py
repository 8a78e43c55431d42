"""Integration test: quadrature weights produce correct integrals.

Analog of math-bem/examples/integration_test.rs ("Verify quadrature
weights produce correct integrals. Tests that int 1 dS = surface area
and int G dS has expected magnitude"): on icosphere refinements check
(a) sum of all quadrature weights converges to 4*pi*a^2, (b) the
element-wise int G(x, y) dS_y from a far collocation point matches the
closed form for a sphere (the single-layer potential of a uniform
density on a sphere of radius a is a^2 e^{ika} sin(ka)/(ka) / r *
e^{ik(r-a)} ... evaluated directly by a dense high-order reference
here), and (c) the refined (subdivided) rule agrees with the base rule
on regular pairs.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np  # noqa: E402

from mathaudio_tpu.bem.mesh import icosphere  # noqa: E402

a = 1.0
k = 2.0
x0 = np.array([0.0, 0.0, 3.0])  # exterior collocation point


def green(r):
    return np.exp(1j * k * r) / (4 * np.pi * r)


print(f"{'subdiv':>6} {'N':>6} {'sum(w)':>10} {'area err':>10} "
      f"{'|int G dS|':>11} {'refined rel':>12}")
prev = None
for subdiv in (1, 2, 3):
    mesh = icosphere(a, subdiv)
    qp, qw = mesh.quad_points(3)
    total = float(qw.sum())
    area_err = abs(total - 4 * np.pi * a**2) / (4 * np.pi * a**2)

    # int_S G(x0, y) dS_y over the whole sphere: uniform single layer,
    # exact value a sin(ka)/(k |x0|) e^{ik|x0|} (classic mean-value
    # identity for the Helmholtz single-layer on a sphere)
    r = np.linalg.norm(qp - x0, axis=-1)
    ig = (green(r) * qw).sum()
    exact = a * np.sin(k * a) / (k * np.linalg.norm(x0)) * np.exp(
        1j * k * np.linalg.norm(x0)
    )
    g_rel = abs(ig - exact) / abs(exact)

    # refined rule consistency on the same elements
    qpf, qwf = mesh.quad_points_refined(3, depth=1)
    igf = (green(np.linalg.norm(qpf - x0, axis=-1)) * qwf).sum()
    ref_rel = abs(igf - ig) / abs(ig)

    print(f"{subdiv:6d} {mesh.num_elements:6d} {total:10.5f} {area_err:10.2e} "
          f"{abs(ig):11.5f} {ref_rel:12.2e}")
    # facetted sphere underestimates the true area; error must shrink 4x/level
    if prev is not None:
        assert area_err < prev * 0.3, (area_err, prev)
    prev = area_err
    assert g_rel < 0.05, g_rel
    assert ref_rel < 1e-3, ref_rel
print("OK: sum(w) -> 4 pi a^2, int G dS matches the sphere mean-value identity")
