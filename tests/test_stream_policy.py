"""defer_ambiguous: same factor multiset, bounded arrival delay, plain
factors untouched (reference lever being modeled: per-factor hypothesis
machinery, src/factors/Factors.py:3146-3180)."""
import numpy as np

from nfisam_tpu.core import R2Variable, SE2Variable, VariableType
from nfisam_tpu.factors import (SE2R2RangeGaussianLikelihoodFactor,
                                SE2RelativeGaussianLikelihoodFactor)
from nfisam_tpu.factors.mixtures import AmbiguousDataAssociationFactor
from nfisam_tpu.io.stream_policy import defer_ambiguous


def _stream():
    xs = [SE2Variable(f"X{i}") for i in range(8)]
    ls = [R2Variable(f"L{i}", VariableType.Landmark) for i in range(2)]
    cov = np.diag([0.01, 0.01, 0.001])
    batches = []
    for i in range(7):
        fs = [SE2RelativeGaussianLikelihoodFactor(
            xs[i], xs[i + 1], np.array([1.0, 0.0, 0.0]), cov)]
        if i == 1:   # ambiguous range before any landmark is localized
            fs.append(AmbiguousDataAssociationFactor(
                observer_var=xs[i], observed_vars=ls,
                weights=[0.5, 0.5],
                binary_factor_class=SE2R2RangeGaussianLikelihoodFactor,
                observation=np.array([2.0]), sigma=0.3))
        if i >= 3:   # unambiguous ranges localize both landmarks
            for lm in ls:
                fs.append(SE2R2RangeGaussianLikelihoodFactor(
                    xs[i], lm, 2.0, 0.3))
        batches.append(([xs[i]] if i else [xs[0], *ls], fs))
    return batches


def test_multiset_preserved_and_delay_bounded():
    batches = _stream()
    out = defer_ambiguous(batches, max_steps=6, min_plain=2)
    orig = [f for _, fs in batches for f in fs]
    new = [f for _, fs in out for f in fs]
    assert sorted(map(id, orig)) == sorted(map(id, new))
    # the one ambiguous factor arrives AFTER both landmarks have >=2
    # plain factors: plain counts reach 2 at batch index 4
    arrival = {id(f): i for i, (_, fs) in enumerate(out) for f in fs}
    amb = [f for f in orig if isinstance(
        f, AmbiguousDataAssociationFactor)]
    assert len(amb) == 1
    assert arrival[id(amb[0])] == 4
    # plain factors keep their original step
    for i, (_, fs) in enumerate(batches):
        for f in fs:
            if not isinstance(f, AmbiguousDataAssociationFactor):
                assert arrival[id(f)] == i


def test_bounded_delay_releases_unlocalized():
    batches = _stream()
    # drop the plain ranges so candidates never reach min_plain: the
    # mixture must still be released within max_steps
    batches = [(ns, [f for f in fs if not (
        isinstance(f, SE2R2RangeGaussianLikelihoodFactor))])
        for ns, fs in batches]
    amb = [f for _, fs in batches for f in fs
           if isinstance(f, AmbiguousDataAssociationFactor)]
    out = defer_ambiguous(batches, max_steps=3, min_plain=2)
    arrival = {id(f): i for i, (_, fs) in enumerate(out) for f in fs}
    assert arrival[id(amb[0])] == 1 + 3
