"""Conflicting-prior simulation semantics: when two prior factors share
variables (sibling subtrees' separator flows carrying a shared landmark),
the schedule must draw the second factor's SUFFIX conditioned on the
already-drawn prefix — the consistent tree factorization — instead of the
reference's overwrite (``SimulationBasedSampler.py:19`` "assuming no
conflicts in prior factors", which decouples the earlier factor's other
columns from the shared variable)."""
import jax.numpy as jnp
import numpy as np

from nfisam_tpu.core import R2Variable
from nfisam_tpu.factors.factors import PriorFactor
from nfisam_tpu.samplers.simulation import compile_schedule, execute_schedule


class _FixedPrior(PriorFactor):
    """Joint prior over vars drawing deterministic per-var constants."""

    def __init__(self, vars_, values, conditional=False):
        self._vars = list(vars_)
        self._values = np.asarray(values, dtype=np.float32)
        if conditional:
            # mimic FlowsPriorFactor: draw suffix | prefix as
            # prefix.sum(axis=1, keepdims) + suffix constants — any
            # prefix dependence lets the test detect that the prefix
            # actually flowed in
            self.sample_conditional = self._sample_conditional

    @property
    def vars(self):
        return self._vars

    def sample(self, key, num_samples):
        return jnp.broadcast_to(
            jnp.asarray(self._values),
            (num_samples, self._values.shape[0]))

    def _sample_conditional(self, key, prefix_samples):
        prefix_dim = prefix_samples.shape[1]
        suffix = self._values[prefix_dim:]
        return (jnp.sum(prefix_samples, axis=1, keepdims=True)
                + jnp.broadcast_to(jnp.asarray(suffix),
                                   (prefix_samples.shape[0],
                                    suffix.shape[0])))

    def __str__(self):
        return "Factor _FixedPrior " + " ".join(
            str(v.name) for v in self._vars)


def test_conflicting_priors_condition_on_shared_prefix():
    a, b, c = R2Variable("A"), R2Variable("B"), R2Variable("C")
    # f1 anchors (A, B); f2 covers (A, C) with A leading (root-most) —
    # conditional-capable, so it must be scheduled as prior_cond
    f1 = _FixedPrior([a, b], [1.0, 2.0, 3.0, 4.0])
    f2 = _FixedPrior([a, c], [9.0, 9.0, 0.5, 0.25], conditional=True)
    sched = compile_schedule([f1, f2], [a, b, c])
    kinds = [op.kind for op in sched.ops]
    assert kinds == ["prior", "prior_cond"], kinds

    out = execute_schedule(np.array([0, 1], dtype=np.uint32), sched,
                           [a, b, c], num_samples=4)
    # A keeps f1's draw (no overwrite by f2)
    np.testing.assert_allclose(np.asarray(out[a]),
                               np.tile([1.0, 2.0], (4, 1)))
    # C was drawn CONDITIONED on f1's A draw: sum(prefix)=3.0 + suffix
    np.testing.assert_allclose(np.asarray(out[c]),
                               np.tile([3.5, 3.25], (4, 1)))


def test_non_conditional_conflict_keeps_reference_overwrite():
    a, b, c = R2Variable("A"), R2Variable("B"), R2Variable("C")
    f1 = _FixedPrior([a, b], [1.0, 2.0, 3.0, 4.0])
    f2 = _FixedPrior([a, c], [9.0, 8.0, 0.5, 0.25])  # no conditional
    sched = compile_schedule([f1, f2], [a, b, c])
    assert [op.kind for op in sched.ops] == ["prior", "prior"]
    out = execute_schedule(np.array([0, 1], dtype=np.uint32), sched,
                           [a, b, c], num_samples=2)
    # reference semantics: the later prior overwrites the shared var
    np.testing.assert_allclose(np.asarray(out[a]),
                               np.tile([9.0, 8.0], (2, 1)))


def test_fully_determined_prior_is_skipped():
    a, b = R2Variable("A"), R2Variable("B")
    f1 = _FixedPrior([a, b], [1.0, 2.0, 3.0, 4.0])
    f2 = _FixedPrior([a], [7.0, 7.0], conditional=True)
    sched = compile_schedule([f1, f2], [a, b])
    assert [op.kind for op in sched.ops] == ["prior"]
