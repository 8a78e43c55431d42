"""Native C++ kernels vs Python fallbacks."""

import numpy as np
import pytest

from mathaudio_tpu import native
from mathaudio_tpu.solvers.sparse import CsrMatrix


class TestNative:
    def test_builds_and_loads(self):
        lib = native.load_native()
        assert lib is not None, "toolchain available in this image; must build"

    def test_ilu0_matches_python(self):
        rng = np.random.default_rng(0)
        n = 60
        a = rng.standard_normal((n, n)) * 0.1 + 4 * np.eye(n)
        a[np.abs(a) < 0.15] = 0.0
        np.fill_diagonal(a, 4.0)
        csr = CsrMatrix.from_dense(a)

        data_native = np.ascontiguousarray(csr.data, np.complex128).copy()
        ok = native.ilu0_factor_inplace(csr.indptr, csr.indices, data_native)
        assert ok

        # python reference (force fallback by monkeypatching)
        import mathaudio_tpu.solvers.preconditioners.ilu as ilu_mod

        orig = native.ilu0_factor_inplace
        try:
            native.ilu0_factor_inplace = lambda *a_, **k_: False
            l_py, u_py = ilu_mod.ilu0_factor(csr)
        finally:
            native.ilu0_factor_inplace = orig
        l_nat, u_nat = ilu_mod._split_lu(csr, data_native.real)
        np.testing.assert_allclose(l_nat.to_dense(), l_py.to_dense(), atol=1e-12)
        np.testing.assert_allclose(u_nat.to_dense(), u_py.to_dense(), atol=1e-12)

    def test_pmis_is_independent_set(self):
        import scipy.sparse as sp

        rng = np.random.default_rng(1)
        n = 200
        a = sp.random(n, n, density=0.03, random_state=2, format="csr")
        sym = ((a + a.T) > 0).astype(np.int8)
        w = sym.sum(axis=1).A.ravel().astype(float) + rng.random(n)
        isc = native.pmis_coarsen(sym.indptr, sym.indices, w)
        if isc is None:
            pytest.skip("no native lib")
        # coarse points form an independent set in the graph
        rows = np.repeat(np.arange(n), np.diff(sym.indptr))
        both = isc[rows] & isc[sym.indices] & (rows != sym.indices)
        assert not both.any()
        # maximality: every fine point has a coarse neighbor
        fine = ~isc
        has_coarse_nbr = np.zeros(n, bool)
        np.logical_or.at(has_coarse_nbr, rows, isc[sym.indices])
        isolated = fine & ~has_coarse_nbr
        # isolated points (no neighbors at all) are allowed to stay fine
        deg = np.diff(sym.indptr)
        assert not (isolated & (deg > 0)).any()
