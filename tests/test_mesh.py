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


def test_fit_program_actually_shards_and_reduces():
    """Prove the fit path distributes data: the input sharding spans all 8
    devices, and the compiled program reduces gradients with an all-reduce.
    Both assertions fail if the mesh argument were ignored (replicated data
    compiles to a collective-free program)."""
    from nfisam_tpu.train.trainer import _cached_full_program
    mesh = make_mesh(n_clique=2, n_data=4)
    cfg = NSFConfig(dim=4, num_knots=5, hidden_dim=4)
    tc = TrainConfig(max_iters=40, learning_rate=0.05)
    n = 160
    data = jnp.asarray(np.random.default_rng(1).normal(size=(n, 4)),
                       dtype=jnp.float32)
    sharded = jax.device_put(
        data, NamedSharding(mesh, P(("clique", "data"), None)))
    assert len(sharded.sharding.device_set) == 8
    assert sharded.addressable_shards[0].data.shape == (n // 8, 4)

    prog = _cached_full_program(cfg, tc, True, n)
    key = np.array([0, 1], np.uint32)
    mask = jnp.zeros(4, bool)
    hlo_sharded = prog.lower(key, sharded, mask).compile().as_text()
    assert "all-reduce" in hlo_sharded
    hlo_replicated = prog.lower(key, data, mask).compile().as_text()
    assert "all-reduce" not in hlo_replicated


def test_fit_flows_batched_clique_sharding_matches_unsharded():
    """Batched clique fits on a (clique, data) mesh: outputs are sharded
    over the clique axis, B not divisible by the clique axis is padded, and
    results match the unsharded program to float tolerance."""
    from nfisam_tpu.train.trainer import fit_flows_batched
    mesh = make_mesh(n_clique=2, n_data=4)
    cfg = NSFConfig(dim=4, num_knots=5, hidden_dim=4)
    tc = TrainConfig(max_iters=40, learning_rate=0.05)
    rng = np.random.default_rng(2)
    B, n = 3, 160     # B=3 -> padded to 4 on the clique axis
    keys = np.stack([np.array([0, i], np.uint32) for i in range(B)])
    stack = rng.normal(size=(B, n, 4)).astype(np.float32)
    masks = np.zeros((B, 4), bool)

    p_s, il_s, t_s, m_s, s_s = fit_flows_batched(keys, stack, cfg, tc,
                                                 masks, mesh=mesh)
    p_u, il_u, t_u, m_u, s_u = fit_flows_batched(keys, stack, cfg, tc,
                                                 masks, mesh=None)
    assert np.array_equal(np.asarray(t_s), np.asarray(t_u))
    np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_u),
                               atol=1e-5)
    # Adam amplifies reduction-order float drift over iterations, so params
    # are compared loosely; the loss trajectories must stay tight.
    for b in range(B):
        tb = int(np.asarray(t_s)[b])
        np.testing.assert_allclose(np.asarray(il_s)[b, :tb],
                                   np.asarray(il_u)[b, :tb], rtol=5e-3,
                                   atol=5e-3)
    for ls, lu in zip(jax.tree_util.tree_leaves(p_s),
                      jax.tree_util.tree_leaves(p_u)):
        np.testing.assert_allclose(np.asarray(ls), np.asarray(lu),
                                   atol=5e-2)


def test_parallel_solver_end_to_end_on_mesh():
    """The PRODUCT path on a multi-device mesh: a ParallelNFiSAM solve with
    data_parallel_mesh + sample_mesh produces posterior moments matching
    the single-device solve, and the posterior draws come back sharded."""
    from nfisam_tpu.factors import (GaussianPriorFactor,
                                    R2RelativeGaussianLikelihoodFactor)
    from nfisam_tpu.core.variables import R2Variable, VariableType
    from nfisam_tpu.parallel.scheduler import ParallelNFiSAM
    from nfisam_tpu.solver import NFiSAMArgs

    def build(mesh=None):
        a = R2Variable("x0")
        b = R2Variable("x1")
        c = R2Variable("l1", variable_type=VariableType.Landmark)
        args = NFiSAMArgs(posterior_sample_num=512, local_sample_num=512,
                          flow_iterations=150, num_knots=5, hidden_dim=4,
                          learning_rate=0.05,
                          elimination_method="pose_first", seed=3,
                          data_parallel_mesh=mesh, sample_mesh=mesh)
        s = ParallelNFiSAM(args)
        for v in (a, b, c):
            s.add_node(v)
        s.add_factor(GaussianPriorFactor(a, np.zeros(2), np.eye(2) * 0.04))
        s.add_factor(R2RelativeGaussianLikelihoodFactor(
            a, b, np.array([1.0, 0.0]), np.eye(2) * 0.01))
        s.add_factor(R2RelativeGaussianLikelihoodFactor(
            b, c, np.array([0.0, 1.0]), np.eye(2) * 0.01))
        s.update_physical_and_working_graphs()
        return s.incremental_inference(), (a, b, c)

    mesh = make_mesh(n_clique=2, n_data=4)
    samples_mesh, vars_ = build(mesh)
    samples_single, _ = build(None)

    sharded_seen = False
    for v in vars_:
        sm = samples_mesh[[k for k in samples_mesh if k.name == v.name][0]]
        ss = samples_single[[k for k in samples_single
                             if k.name == v.name][0]]
        if hasattr(sm, "sharding") and \
                len(sm.sharding.device_set) > 1:
            sharded_seen = True
        np.testing.assert_allclose(np.asarray(sm).mean(0),
                                   np.asarray(ss).mean(0), atol=0.15)
        np.testing.assert_allclose(np.asarray(sm).std(0),
                                   np.asarray(ss).std(0), atol=0.15)
    assert sharded_seen, "no posterior draw was distributed over the mesh"


def test_fit_flows_batched_non_divisible_sample_axis():
    """Sample axes not divisible by the data axis drop the remainder
    instead of crashing device_put (regression: round-2 review)."""
    from nfisam_tpu.train.trainer import fit_flows_batched
    mesh = make_mesh(n_clique=2, n_data=4)
    B, n, dim = 3, 150, 4          # 150 % 4 != 0
    rng = np.random.default_rng(0)
    samples = rng.normal(size=(B, n, dim)).astype(np.float32)
    keys = np.stack([np.array([0, i], dtype=np.uint32) for i in range(B)])
    masks = np.zeros((B, dim), dtype=bool)
    cfg = NSFConfig(dim=dim, hidden_dim=4, num_knots=5)
    tc = TrainConfig(max_iters=5, learning_rate=0.01)
    params, loss, iters, mean, std = fit_flows_batched(
        keys, samples, cfg, tc, masks, mesh=mesh)
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.asarray(mean).shape[0] == B


def test_fit_flow_raw_fewer_samples_than_devices_replicates():
    """n < device count must replicate, not truncate to an empty batch
    that trains an all-NaN flow (regression: round-2 review)."""
    mesh = make_mesh(n_clique=2, n_data=4)
    rng = np.random.default_rng(1)
    samples = rng.normal(size=(5, 4)).astype(np.float32)  # 5 < 8 devices
    cfg = NSFConfig(dim=4, hidden_dim=4, num_knots=5)
    tc = TrainConfig(max_iters=5, learning_rate=0.01)
    params, loss, iters, mean, std = fit_flow_raw(
        np.array([0, 3], dtype=np.uint32), samples, cfg, tc,
        [False] * 4, mesh=mesh)
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.all(np.isfinite(np.asarray(std)))
