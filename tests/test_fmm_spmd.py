"""Multi-device FMM tests (8 virtual CPU devices, see conftest.py).

Covers parallel/fmm_spmd.py: the cluster-sharded SLFMM matvec and the
full in-shard_map GMRES solve, asserting (a) numerical equality with
the single-device SlfmmOperator, (b) genuinely sharded per-device
tensors, and (c) the sharded solve reproduces the dense-validated
scattering solution. Reference analog: batched_blas.rs:237's
shared-memory batched FMM matvec, re-expressed as SPMD.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from mathaudio_tpu.bem import plane_wave
from mathaudio_tpu.bem.fmm import (
    ClusterBlockPreconditioner,
    build_slfmm_system,
    gather_form,
)
from mathaudio_tpu.bem.mesh import icosphere
from mathaudio_tpu.parallel.fmm_spmd import (
    shard_slfmm,
    sharded_slfmm_matvec_fn,
    sharded_slfmm_solve_fn,
)
from mathaudio_tpu.solvers import KrylovConfig
from mathaudio_tpu.solvers.krylov import gmres

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    devices = jax.devices()
    if len(devices) < N_DEV:
        pytest.skip(f"needs {N_DEV} devices")
    return Mesh(np.asarray(devices[:N_DEV]), ("fmm",))


@pytest.fixture(scope="module")
def slfmm_op():
    surf = icosphere(1.0, 2)  # 320 elements
    k = 2.0
    op = build_slfmm_system(surf, k, beta=1j / k)
    return surf, k, op


def test_sharded_matvec_matches_single_device(mesh, slfmm_op):
    _, _, op = slfmm_op
    sharded = shard_slfmm(op.data, N_DEV)
    # per-device tensors are genuinely split
    assert sharded.t_tensor.shape[0] == N_DEV
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(op.n) + 1j * rng.standard_normal(op.n))
    y_ref = op.matvec(x)
    mv = jax.jit(sharded_slfmm_matvec_fn(mesh))
    y = mv(sharded, x)
    err = float(jnp.linalg.norm(y - y_ref) / jnp.linalg.norm(y_ref))
    # 1e-10: the device split reassociates the cluster/pair reductions
    # (measured ~2e-12 in f64) — equality far beyond f32 solve needs
    assert err < 1e-10, f"sharded matvec mismatch: {err:.2e}"


def test_sharded_matvec_matches_gather_form(mesh, slfmm_op):
    """gather_form (the chip layout) and the sharded layout agree."""
    _, _, op = slfmm_op
    opg = gather_form(op)
    sharded = shard_slfmm(op.data, N_DEV)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(op.n) + 1j * rng.standard_normal(op.n))
    mv = jax.jit(sharded_slfmm_matvec_fn(mesh))
    err = float(
        jnp.linalg.norm(mv(sharded, x) - opg.matvec(x))
        / jnp.linalg.norm(opg.matvec(x))
    )
    assert err < 1e-10  # see test above: f64 reassociation noise


def test_sharded_solve_matches_single_device(mesh, slfmm_op):
    surf, k, op = slfmm_op
    beta = 1j / k
    inc = plane_wave((0.0, 0.0, 1.0))
    centers = jnp.asarray(surf.centers)
    normals = jnp.asarray(surf.normals)
    rhs = inc.pressure(centers, k) - beta * inc.normal_derivative(
        centers, normals, k
    )
    pre = ClusterBlockPreconditioner.from_operator(op)
    config = KrylovConfig(max_iterations=200, tolerance=1e-8, restart=40)

    sol_ref = gmres(op, rhs, config=config, preconditioner=pre)
    assert bool(sol_ref.converged)

    sharded = shard_slfmm(op.data, N_DEV)
    solve = jax.jit(sharded_slfmm_solve_fn(mesh, config))
    sol = solve(sharded, pre, rhs)
    assert bool(sol.converged)
    # same operator, same preconditioner, same Krylov: same solution
    err = float(jnp.linalg.norm(sol.x - sol_ref.x) / jnp.linalg.norm(sol_ref.x))
    assert err < 1e-8, f"sharded solve mismatch: {err:.2e}"
    assert int(sol.iterations) == int(sol_ref.iterations)


def test_shard_slfmm_partitions_near_pairs(slfmm_op):
    """Every near pair lands on the device owning its target cluster,
    and the padded local tables reproduce the global pair count."""
    _, _, op = slfmm_op
    d = op.data
    sharded = shard_slfmm(d, N_DEV)
    n_pairs = int(np.asarray(d.near_b).shape[0])
    # count real (unmasked) pairs across devices via the local tables
    blocks = np.asarray(sharded.near_blocks)
    nonzero_pairs = int((np.abs(blocks).sum(axis=(2, 3)) > 0).sum())
    assert nonzero_pairs == n_pairs


@pytest.fixture(scope="module")
def tree_op():
    surf = icosphere(1.0, 3)  # 1280 elements -> a real multi-level tree
    k = 4.0
    from mathaudio_tpu.bem.fmm import build_mlfmm_tree_system

    op = build_mlfmm_tree_system(surf, k, max_per_leaf=16)
    return surf, k, op


class TestShardedMlfmmTree:
    """Per-level target-sharded hierarchical MLFMM (VERDICT r4 #3):
    equality with the single-device MlfmmTreeOperator, genuinely sharded
    per-device leaves, and an in-shard_map GMRES reproducing the
    Mie-validated solution. Reference analog: mlfmm.rs:954 matvec."""

    def test_matvec_matches_single_device(self, mesh, tree_op):
        from mathaudio_tpu.parallel.fmm_spmd import (
            shard_mlfmm_tree,
            sharded_mlfmm_tree_matvec_fn,
        )

        surf, k, op = tree_op
        sharded = shard_mlfmm_tree(op.data, N_DEV)
        assert sharded.t_tensor.shape[0] == N_DEV
        assert sharded.levels[-1].trans_op.shape[0] == N_DEV
        mv = jax.jit(sharded_mlfmm_tree_matvec_fn(mesh))
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.standard_normal(op.n) + 1j * rng.standard_normal(op.n)
        )
        y_ref = np.asarray(gather_form(op).matvec(x))
        y = np.asarray(mv(sharded, x))
        rel = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
        assert rel < 1e-11, rel

    def test_solve_matches_and_mie(self, mesh, tree_op):
        from mathaudio_tpu.parallel.fmm_spmd import (
            shard_mlfmm_tree,
            sharded_mlfmm_tree_solve_fn,
        )
        from mathaudio_tpu.wave.analytical import sphere_scattering_3d

        surf, k, op = tree_op
        sharded = shard_mlfmm_tree(op.data, N_DEV)
        inc = plane_wave((0.0, 0.0, 1.0))
        rhs = inc.pressure(jnp.asarray(surf.centers), k)
        cfg = KrylovConfig(max_iterations=300, tolerance=1e-8, restart=60)
        pre = ClusterBlockPreconditioner.from_operator(op)
        solve = jax.jit(sharded_mlfmm_tree_solve_fn(mesh, cfg))
        sol = solve(sharded, pre, rhs)
        assert bool(sol.converged)
        sol_ref = gmres(gather_form(op), rhs, config=cfg, preconditioner=pre)
        rel = float(
            jnp.linalg.norm(sol.x - sol_ref.x) / jnp.linalg.norm(sol_ref.x)
        )
        assert rel < 1e-8, rel
        c = surf.centers
        r_mie = float(np.linalg.norm(c, axis=1).mean())
        th = np.arccos(np.clip(c[:, 2] / np.linalg.norm(c, axis=1), -1, 1))
        ex = np.asarray(
            sphere_scattering_3d(k, 1.0, 60, [r_mie], th).pressure
        ).reshape(-1)
        mie = np.linalg.norm(np.asarray(sol.x) - ex) / np.linalg.norm(ex)
        assert mie < 5e-2, mie
