"""Device-mesh program tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from nfisam_tpu.flows import NSFConfig
from nfisam_tpu.parallel import (build_sharded_conditional_sampler,
                                 build_sharded_train_step,
                                 data_parallel_mesh, make_mesh)
from nfisam_tpu.train import TrainConfig, fit_flow_raw


def test_make_mesh_shapes():
    mesh = make_mesh(n_clique=2, n_data=4)
    assert dict(mesh.shape) == {"clique": 2, "data": 4}
    dp = data_parallel_mesh()
    assert dict(dp.shape) == {"clique": 1, "data": 8}


def test_sharded_train_step_runs_and_descends():
    mesh = make_mesh(n_clique=2, n_data=4)
    cfg = NSFConfig(dim=4, num_knots=5, hidden_dim=4)
    step, init, data_sharding = build_sharded_train_step(cfg, mesh,
                                                        learning_rate=0.05)
    params, opt_state = init(jax.random.PRNGKey(0), n_cliques=4)
    data = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 4))
    data = jax.device_put(data, data_sharding)
    _, _, loss0 = step(params, opt_state, data)
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state, data)
    assert np.all(np.asarray(loss) < np.asarray(loss0))


def test_sharded_conditional_sampler():
    mesh = make_mesh(n_clique=2, n_data=4)
    cfg = NSFConfig(dim=5, num_knots=5, hidden_dim=4)
    from nfisam_tpu.flows import init_flow_params
    params = init_flow_params(jax.random.PRNGKey(2), cfg)
    draw = build_sharded_conditional_sampler(cfg, mesh, sep_dim=2)
    shard = NamedSharding(mesh, P(("clique", "data"), None))
    n = 64
    xp = jax.device_put(jax.random.normal(jax.random.PRNGKey(3), (n, 2)),
                        shard)
    z = jax.device_put(jax.random.normal(jax.random.PRNGKey(4), (n, 3)),
                       shard)
    out = draw(params, xp, z)
    assert out.shape == (n, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_fit_flow_raw_with_data_mesh():
    mesh = data_parallel_mesh()
    cfg = NSFConfig(dim=3, num_knots=5, hidden_dim=4)
    data = np.random.default_rng(0).normal(size=(256, 3)).astype(np.float32)
    params, losses, t, mean, std = fit_flow_raw(
        np.array([0, 1], np.uint32), data, cfg,
        TrainConfig(max_iters=120, learning_rate=0.05), [False] * 3,
        mesh=mesh)
    assert int(t) > 0
    assert np.all(np.isfinite(np.asarray(losses)[:int(t)]))
