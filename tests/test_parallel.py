"""Multi-device sharding on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mathaudio_tpu.fem.mesh import unit_cube_tetrahedra
from mathaudio_tpu.models import RoomSweepModel
from mathaudio_tpu.models.helmholtz_room import sweep_pressure
from mathaudio_tpu.optim import differential_evolution
from mathaudio_tpu.parallel import (
    shard_frequency_sweep,
    shard_population_eval,
    shard_room_params,
    sweep_mesh,
)
from mathaudio_tpu.solvers import KrylovConfig
from mathaudio_tpu.testfunctions import functions as F

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


class TestShardedSweep:
    def test_frequency_sharded_sweep_matches_single(self):
        mesh_dev = sweep_mesh(8, dof_parallel=2)
        model = RoomSweepModel(unit_cube_tetrahedra(5), absorption=0.2)
        cfg = KrylovConfig(max_iterations=400, tolerance=1e-8, restart=20)

        def sweep(params, ks):
            p, its, conv = sweep_pressure(
                params, ks, absorption=0.2, config=cfg,
                num_nodes=model.num_nodes, ell_width=model.ell_width,
            )
            return p

        ks = jnp.linspace(0.6, 1.8, 8, dtype=model.dtype)
        p_single = np.asarray(sweep(model.params(), ks))

        with mesh_dev:
            params_sh = shard_room_params(mesh_dev, model.params())
            fn = shard_frequency_sweep(mesh_dev, sweep)
            p_sharded = np.asarray(fn(params_sh, ks))
        np.testing.assert_allclose(p_sharded, p_single, rtol=2e-5, atol=1e-9)

    def test_population_sharded_de_eval(self):
        mesh_dev = sweep_mesh(8, dof_parallel=1)
        with mesh_dev:
            eval_fn = shard_population_eval(mesh_dev, F.rastrigin)
            pop = jnp.asarray(np.random.default_rng(0).uniform(-5, 5, (64, 4)))
            e = np.asarray(eval_fn(pop))
        ref = np.asarray(jax.vmap(F.rastrigin)(pop))
        np.testing.assert_allclose(e, ref, rtol=1e-12)


class TestBemSweepSharding:
    def test_bem_sweep_frequency_sharded(self):
        """The batched BEM sweep shards over the frequency axis
        (embarrassingly parallel — one dense system per device slice)."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from mathaudio_tpu.bem import plane_wave
        from mathaudio_tpu.bem.mesh import icosphere
        from mathaudio_tpu.bem.sweep import sweep_fn

        surf = icosphere(1.0, 1)  # 80 elements
        inc = plane_wave((0.0, 0.0, 1.0))
        ks = jnp.linspace(0.5, 2.0, 8)
        betas = jnp.zeros_like(ks).astype(jnp.complex128)
        centers = jnp.asarray(surf.centers)
        rhs = jax.vmap(lambda k: inc.pressure(centers, k))(ks)
        fn = sweep_fn(surf, burton_miller=False)
        ref = jax.jit(fn)(ks, betas, rhs)

        mesh = Mesh(np.array(jax.devices()[:8]), ("freq",))
        sh = NamedSharding(mesh, P("freq"))
        out = jax.jit(fn, in_shardings=(sh, sh, sh))(ks, betas, rhs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)


class TestDofSharding:
    def test_freq_x_dof_sharded_sweep_matches_unsharded(self):
        """The (freq x dof) sharded FEM sweep (tensor-parallel row
        partition of the ELL operator + data-parallel frequency axis)
        produces the same pressures as the single-device run."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from mathaudio_tpu.fem.mesh import unit_cube_tetrahedra
        from mathaudio_tpu.models import RoomSweepModel
        from mathaudio_tpu.models.helmholtz_room import sweep_pressure
        from mathaudio_tpu.solvers import KrylovConfig

        model = RoomSweepModel(
            unit_cube_tetrahedra(5), wall_tags=(1, 2, 3, 4, 5, 6),
            absorption=0.1,
            listening_positions=((0.25, 0.25, 0.25), (0.7, 0.6, 0.4)),
        )
        config = KrylovConfig(max_iterations=40, tolerance=1e-8, restart=10)
        params = model.params()

        def step(p, ks):
            out, its, conv = sweep_pressure(
                p, ks, absorption=model.absorption, config=config,
                num_nodes=model.num_nodes, ell_width=model.ell_width,
            )
            return out

        ks = jnp.linspace(0.8, 2.5, 8, dtype=model.dtype)
        ref = jax.jit(step)(params, ks)

        mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("freq", "dof"))
        with mesh:
            sh_freq = NamedSharding(mesh, P("freq"))
            sh_repl = NamedSharding(mesh, P())
            sh_dof = NamedSharding(mesh, P("dof"))
            ks_s = jax.device_put(ks, sh_freq)
            params_s = params._replace(
                rhs=jax.device_put(params.rhs, sh_dof),
                ell_indices=jax.device_put(params.ell_indices, sh_dof),
            )
            out = jax.jit(step, out_shardings=sh_freq)(params_s, ks_s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-8, atol=1e-10)


class TestDenseBemRowSharding:
    def test_row_sharded_bem_gmres_matches(self):
        """A single large dense BEM system sharded by row blocks across
        the device mesh (SURVEY §5 'shard the dense BEM matrix by row
        blocks'): GMRES through the sharded matrix equals single-device."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from mathaudio_tpu.bem import plane_wave
        from mathaudio_tpu.bem.assembly import assemble_collocation_matrix
        from mathaudio_tpu.bem.mesh import icosphere
        from mathaudio_tpu.solvers import KrylovConfig, gmres

        surf = icosphere(1.0, 2)  # 320 elements
        k = 1.0
        a = assemble_collocation_matrix(surf, k)
        rhs = plane_wave((0.0, 0.0, 1.0)).pressure(jnp.asarray(surf.centers), k)
        cfg = KrylovConfig(tolerance=1e-10, restart=40, max_iterations=200)
        solve = jax.jit(lambda a, b: gmres(a, b, config=cfg).x)
        ref = solve(a, rhs)

        mesh = Mesh(np.asarray(jax.devices()[:8]), ("dof",))
        sh_row = NamedSharding(mesh, P("dof", None))
        sh_vec = NamedSharding(mesh, P("dof"))
        out = jax.jit(
            lambda a, b: gmres(a, b, config=cfg).x,
            in_shardings=(sh_row, sh_vec),
        )(a, rhs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-8, atol=1e-10)
