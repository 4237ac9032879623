"""NF-iSAM: normalizing-flow clique density models on the Bayes tree.

Parity with reference ``src/slam/NFiSAM.py`` (``NFiSAMArgs:18``,
``NFiSAM:317``, ``FlowsPriorFactor:202``, conditional flow model
``NormalizingFlowModelWithSeparator:68``) — with the flow math, training,
and sampling living in the jitted ``nfisam_tpu.flows`` / ``train`` layers.
"""
from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.variables import Variable
from ..flows.model import CliqueFlowModel, normalize
from ..flows.nsf import NSFConfig
from ..graph.bayes_tree import CliqueNode
from ..train.trainer import TrainConfig, fit_flow_raw
from .solver import (CliqueSeparatorFactor, ConditionalSampler,
                     FactorGraphSolver, SolverArgs)


@dataclass
class NFiSAMArgs(SolverArgs):
    elimination_method: str = "pose_first"
    learning_rate: float = 0.015
    flow_number: int = 1
    flow_type: str = "NSF_AR"          # NSF_AR | NSF_AR_CS
    flow_iterations: int = 2000
    num_knots: int = 12
    hidden_dim: int = 8
    average_window: int = 50
    loss_delta_tol: float = 1e-2
    training_set_frac: float = 1.0
    validation_interval: int = 10
    slower_stop_rate: float = 2.0
    training_loss_dir: Optional[str] = None
    # TPU extensions
    data_parallel_mesh: Optional[object] = None   # jax.sharding.Mesh
    sample_mesh: Optional[object] = None          # shard posterior draws
    # multi-host clique chunking over DCN (parallel/multihost.py):
    # "auto" = on when jax.process_count() > 1
    host_parallel: object = "auto"
    checkpoint_dir: Optional[str] = None          # persist clique models
    # clique-dim bucketing (SURVEY §7.3 item 3): 0 (default) pads every
    # clique up to the next power of two >= ``dim_bucket_floor`` so a whole
    # solve typically hits ONE flow signature (one trainer + one fused-pass
    # + one conditional-sample compile, prewarmable at solver start);
    # a positive value pads to that multiple instead (legacy behavior)
    pad_dim_multiple: int = 0
    dim_bucket_floor: int = 16
    # capacity scaling: conditioner width grows with clique dim
    # (hidden = max(hidden_dim, aug_dim // 2)).  A hidden=8 flow cannot
    # fit the 50-dim cliques that many-landmark graphs produce under
    # pose_first elimination (measured: 1024-pose/24-landmark run
    # diverged to 250+ m RMSE; separators carried ~25 variables).  The
    # wider conditioners cost FLOPs the chip has spare by orders of
    # magnitude (PROFILE.json MFU <1%), and dims <= 2*hidden_dim are
    # unaffected, so every small-clique benchmark signature is unchanged.
    scale_hidden_with_dim: bool = True

    def json_str(self) -> str:
        d = {k: v for k, v in self.__dict__.items()
             if k not in ("data_parallel_mesh", "sample_mesh")}
        return json.dumps(d)

    def train_config(self) -> TrainConfig:
        return TrainConfig(
            max_iters=self.flow_iterations,
            learning_rate=self.learning_rate,
            average_window=self.average_window,
            loss_delta_tol=self.loss_delta_tol,
            validation_interval=self.validation_interval,
            slower_stop_rate=self.slower_stop_rate,
            training_set_frac=self.training_set_frac)


def effective_hidden_dim(args, aug_dim: int) -> int:
    """Conditioner width for a clique of ``aug_dim`` columns (see
    ``NFiSAMArgs.scale_hidden_with_dim``)."""
    if getattr(args, "scale_hidden_with_dim", True):
        return max(int(args.hidden_dim), int(aug_dim) // 2)
    return int(args.hidden_dim)


class FlowModelAdapter(ConditionalSampler):
    """Wraps a CliqueFlowModel with the solver-facing conditional-sampler
    protocol (reference ``NormalizingFlowModelWithSeparator`` NFiSAM.py:68).

    With ``mesh`` set, the sample axis of conditional draws is sharded over
    the mesh's data axis; XLA keeps the root-to-leaf pass sharded with no
    resharding between tree levels."""

    def __init__(self, model: CliqueFlowModel, key_source, mesh=None):
        self.model = model
        self._next_key = key_source
        self._mesh = mesh

    def conditional_sample_given_observation(self, conditional_dim,
                                             obs_samples=None,
                                             sample_number=None):
        if obs_samples is None and sample_number is None:
            raise ValueError("need obs_samples or sample_number")
        n = sample_number if sample_number is not None else 0
        if self._mesh is not None and obs_samples is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            axis = self._mesh.axis_names[-1]
            obs_samples = jax.device_put(
                jnp.asarray(obs_samples, dtype=jnp.float32),
                NamedSharding(self._mesh, P(axis, None)))
        out = self.model.conditional_sample(self._next_key(), n,
                                            obs_samples=obs_samples)
        return out[:, :conditional_dim] if conditional_dim else out


class FlowsPriorFactor(CliqueSeparatorFactor):
    """Separator-marginal factor backed by a trained flow
    (reference ``FlowsPriorFactor`` NFiSAM.py:202)."""

    def __init__(self, vars: List[Variable], flow_model: CliqueFlowModel,
                 true_obs: np.ndarray, circular_dim_list: List[bool],
                 key_source) -> None:
        self._vars = list(vars)
        self._flow_model = flow_model
        self._true_obs = np.asarray(true_obs, dtype=np.float64).reshape(-1)
        self._obs_dim = self._true_obs.shape[0]
        self._circular_dim_list = list(circular_dim_list)
        self._next_key = key_source
        assert self.dim == len(self._circular_dim_list)
        # content fingerprint of the backing flow (checkpoint invalidation
        # for downstream cliques).  The host-side tag stamped at training
        # time is preferred; hashing device arrays forces d2h transfers,
        # which degrade the tunneled TPU link for every later op.
        if flow_model.content_tag:
            self.content_tag = flow_model.content_tag
        else:
            import hashlib
            hh = hashlib.sha256()
            hh.update(np.asarray(flow_model.mean).tobytes())
            hh.update(np.asarray(flow_model.std).tobytes())
            hh.update(np.asarray(flow_model.flow_params[0]["b3"]).tobytes())
            self.content_tag = hh.hexdigest()[:16]

    @property
    def vars(self) -> List[Variable]:
        return self._vars

    @property
    def is_gaussian(self) -> bool:
        return False

    @property
    def circular_dim_list(self) -> List[bool]:
        return self._circular_dim_list

    def _augment(self, x: np.ndarray) -> np.ndarray:
        if self._obs_dim == 0:
            return np.asarray(x)
        obs = np.tile(self._true_obs, (np.asarray(x).shape[0], 1))
        return np.concatenate([obs, np.asarray(x)], axis=1)

    def log_pdf(self, x) -> jax.Array:
        """Separator marginal log density (up to a constant: the stored
        observation columns are fixed)."""
        aug = self._augment(np.asarray(x, dtype=np.float32))
        _, prior_lp, log_det = self._flow_model.separator_forward(
            jnp.asarray(aug))
        return prior_lp + log_det

    def pdf(self, x) -> jax.Array:
        return jnp.exp(self.log_pdf(x))

    def grad_x_log_pdf(self, x) -> jax.Array:
        def f(row):
            aug = row[None]
            _, prior_lp, log_det = self._flow_model.separator_forward(aug)
            return (prior_lp + log_det)[0]
        aug = self._augment(np.asarray(x, dtype=np.float32))
        grads = jax.vmap(jax.grad(f))(jnp.asarray(aug))
        return grads[:, self._obs_dim:]

    def evaluate_loglike(self, x):
        return self.log_pdf(np.asarray(x).reshape(1, -1))[0]

    def sample(self, key: jax.Array, num_samples: int) -> jax.Array:
        if self._obs_dim == 0:
            return self._flow_model.conditional_sample(key, num_samples)
        obs = np.tile(self._true_obs, (num_samples, 1))
        return self._flow_model.conditional_sample(key, 0, obs_samples=obs)

    def sample_conditional(self, key: jax.Array,
                           prefix_samples) -> jax.Array:
        """Draw the remaining suffix of ``self.vars`` given samples of a
        PREFIX of them — used when a sibling separator flow already drew
        the shared (root-most) variables, so the simulated joint stays
        the consistent tree factorization instead of the reference's
        overwrite (``SimulationBasedSampler.py:19`` "assuming no
        conflicts").  The AR flow conditions on [true_obs | prefix]
        directly."""
        import jax.numpy as jnp
        prefix_samples = jnp.asarray(prefix_samples, dtype=jnp.float32)
        n = prefix_samples.shape[0]
        if self._obs_dim:
            obs = jnp.broadcast_to(
                jnp.asarray(self._true_obs, dtype=jnp.float32),
                (n, self._obs_dim))
            prefix_full = jnp.concatenate([obs, prefix_samples], axis=1)
        else:
            prefix_full = prefix_samples
        out = self._flow_model.conditional_sample(
            key, 0, obs_samples=prefix_full)
        suffix_dim = self.dim - (prefix_full.shape[1] - self._obs_dim)
        return out[:, :suffix_dim]

    def unif_to_sample(self, u) -> jax.Array:
        """Single ``(d,)`` or batched ``(n, d)`` uniform-cube transform."""
        u = jnp.asarray(u, dtype=jnp.float32)
        squeeze = u.ndim == 1
        z = jax.scipy.stats.norm.ppf(
            jnp.clip(jnp.atleast_2d(u), 1e-12, 1.0 - 1e-12))
        from ..flows.model import unnormalize
        from ..flows.nsf import stack_inverse
        m = self._flow_model
        if self._obs_dim == 0:
            x_prefix, sep = None, 0
        else:
            obs = jnp.broadcast_to(
                jnp.asarray(self._true_obs, dtype=jnp.float32),
                (z.shape[0], self._obs_dim))
            x_prefix = normalize(obs, m.mean, m.std, m._mask, 0)
            sep = self._obs_dim
        # the flow may be wider than this factor (frontal + pad columns);
        # drive the extra dims with zeros and slice the result
        need = m.cfg.dim - sep
        if z.shape[1] < need:
            z = jnp.concatenate(
                [z, jnp.zeros((z.shape[0], need - z.shape[1]),
                              dtype=jnp.float32)], axis=1)
        x_full = stack_inverse(m.flow_params, z, m.cfg, x_prefix, sep)
        out = unnormalize(x_full[:, sep:], m.mean, m.std, m._mask,
                          init_dim=sep)[:, :self.dim]
        return out[0] if squeeze else out

    def __str__(self) -> str:
        return "Factor FlowsPriorFactor " + \
            " ".join(str(v.name) for v in self._vars)


class NFiSAM(FactorGraphSolver):
    """Concrete flow-based solver (reference ``NFiSAM`` NFiSAM.py:317)."""

    def __init__(self, args: NFiSAMArgs = None):
        super().__init__(args=args or NFiSAMArgs())
        self._args: NFiSAMArgs = self._args
        self._model_store = None
        if self._args.checkpoint_dir is not None:
            from .checkpoint import CliqueModelStore
            self._model_store = CliqueModelStore(self._args.checkpoint_dir)
        # cold-start: compile the expected program set in background threads
        # while the caller is still building the graph (train/prewarm.py)
        from ..train.prewarm import prewarm_solver_programs
        prewarm_solver_programs(self._args)

    def _clique_signature(self, clique):
        from .checkpoint import clique_signature
        subgraph = self._working_graph.clique_subgraph(clique)
        pattern = self._working_bayes_tree.clique_variable_pattern(clique)
        from ..samplers.simulation import compile_schedule
        schedule = compile_schedule(subgraph.factors, pattern)
        circ = []
        for v in schedule.var_ordering:
            circ += v.circular_dim_list
        cfg = self._flow_config(len(circ), circ)
        return clique_signature(clique, schedule.var_ordering,
                                subgraph.factors, cfg), schedule

    def try_load_clique_model(self, clique):
        """Warm start from the checkpoint store when the clique's factors,
        column ordering, and flow config are unchanged (SURVEY §5:
        checkpoint keyed by clique signature)."""
        if self._model_store is None:
            return None
        if getattr(self, "_repair_vars", None) and \
                (self._repair_vars & clique.vars):
            # mode repair evicted this clique BECAUSE its stored flow's
            # trained support is wrong; a descendant's factor set can be
            # unchanged (the contradicting factor lives elsewhere), so
            # the signature alone cannot invalidate it
            return None
        sig, schedule = self._clique_signature(clique)
        model = self._model_store.load(sig)
        if model is None:
            return None
        return (FlowModelAdapter(model, self._next_key),
                schedule.unused_obs)

    # ------------------------------------------------------------- fitting
    def _flow_config(self, aug_dim: int,
                     circular_dim_list: List[bool]) -> NSFConfig:
        if self._args.flow_type == "NSF_AR":
            circ = ()
        elif self._args.flow_type == "NSF_AR_CS":
            circ = tuple(bool(c) for c in circular_dim_list)
        else:
            raise NotImplementedError(
                f"Unknown flow type {self._args.flow_type}")
        return NSFConfig(dim=aug_dim, num_knots=self._args.num_knots,
                         hidden_dim=effective_hidden_dim(self._args,
                                                         aug_dim),
                         num_flows=self._args.flow_number, circular=circ)

    def _dim_bucket(self, aug_dim: int) -> int:
        """Bucketed flow dim for a clique of ``aug_dim`` columns."""
        mult = int(self._args.pad_dim_multiple or 0)
        if mult > 1:
            return -(-aug_dim // mult) * mult
        b = max(int(getattr(self._args, "dim_bucket_floor", 16) or 16), 2)
        while b < aug_dim:
            b *= 2
        return b

    def _pad_samples(self, samples, circular_dim_list):
        """Pad trailing dummy N(0,1) columns so the flow dim lands on a
        bucket boundary; the AR structure keeps real dims unaffected."""
        aug_dim = samples.shape[-1]
        padded = self._dim_bucket(aug_dim)
        pad = padded - aug_dim
        # a clique outgrew the prewarmed floor bucket: fire warmers for the
        # new bucket now (posterior/conditional programs are needed later
        # this step, so the compile overlaps the imminent training call)
        from ..train.prewarm import prewarm_solver_programs
        prewarm_solver_programs(self._args, dims=(padded,))
        if pad:
            key = self._next_key()
            rng = np.random.default_rng(int(key[1]))
            cols = rng.normal(size=(samples.shape[0], pad)).astype(
                np.float32)
            samples = jnp.concatenate([samples, jnp.asarray(cols)], axis=1)
        return samples, pad

    def fit_clique_density_model(self, clique: CliqueNode, samples,
                                 var_ordering: List[Variable],
                                 timer: Optional[List[float]]
                                 ) -> FlowModelAdapter:
        samples = jnp.asarray(samples, dtype=jnp.float32)
        frontal_dim = clique.frontal_dim
        aug_sep_dim = samples.shape[-1] - frontal_dim

        circular_dim_list: List[bool] = []
        for v in var_ordering:
            circular_dim_list += v.circular_dim_list
        samples, pad = self._pad_samples(samples, circular_dim_list)
        aug_dim = samples.shape[-1]
        padded_circ = circular_dim_list + [False] * pad
        cfg = self._flow_config(aug_dim, padded_circ)

        key = self._next_key()
        t0 = time.time()
        params, iter_loss, n_iters, mean, std = fit_flow_raw(
            key, samples, cfg, self._args.train_config(),
            padded_circ,
            scale_circular=(self._args.flow_type == "NSF_AR"),
            mesh=self._args.data_parallel_mesh)
        if timer is not None:
            timer.append(time.time() - t0)

        # loss curves stay on device until someone (run harness, user)
        # asks for them: per-clique d2h fetches here would serialize the
        # solve on tunnel round trips (see utils/keys.py)
        # sorted: clique.vars is a set; unsorted joins churn per hash seed
        clique_name = "".join(sorted(str(v.name) for v in clique.vars))
        self._temp_training_loss[clique_name] = (iter_loss, n_iters)
        if self._args.training_loss_dir is not None and \
                os.path.isdir(self._args.training_loss_dir):
            fname = os.path.join(self._args.training_loss_dir,
                                 f"{clique_name}.txt")
            np.savetxt(fname, np.asarray(iter_loss)[:int(n_iters)])

        import hashlib
        tag = hashlib.sha256(
            key.tobytes() + repr(cfg).encode() +
            str(samples.shape).encode()).hexdigest()[:16]
        model = CliqueFlowModel(cfg, params, mean, std, circular_dim_list,
                                aug_sep_dim, pad_dims=pad, content_tag=tag)
        if self._model_store is not None:
            sig, _ = self._clique_signature(clique)
            self._model_store.save(sig, model)
        return FlowModelAdapter(model, self._next_key,
                                mesh=self._args.sample_mesh)

    # ----------------------------------------------------------- recycling
    def root_clique_density_model_to_leaf(self, old_clique: CliqueNode,
                                          new_clique: CliqueNode
                                          ) -> FlowModelAdapter:
        old = self._clique_density_model[old_clique]
        obs_dim = old.model.dim - old_clique.dim - old.model.pad_dims
        sep_dim = new_clique.separator_dim + obs_dim
        return FlowModelAdapter(old.model.with_separator_dim(sep_dim),
                                self._next_key)

    def clique_density_to_separator_factor(
            self, separator_var_list: List[Variable],
            density_model: FlowModelAdapter,
            true_obs: np.ndarray) -> FlowsPriorFactor:
        obs_dim = int(np.asarray(true_obs).reshape(-1).shape[0])
        sep_dim = sum(v.dim for v in separator_var_list)
        circ = density_model.model.circular_dim_list[
            obs_dim:obs_dim + sep_dim]
        return FlowsPriorFactor(vars=separator_var_list,
                                flow_model=density_model.model,
                                true_obs=np.asarray(true_obs).reshape(-1),
                                circular_dim_list=circ,
                                key_source=self._next_key)
