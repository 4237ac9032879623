"""Import-time stub for dynesty: the reference's FactorGraphSolver imports
GlobalNestedSampler unconditionally (FactorGraphSolver.py:14) but the
benchmark config uses local_sampling_method="direct", so nested sampling is
never invoked.  Any actual use raises."""


def _unavailable(*args, **kwargs):
    raise NotImplementedError("dynesty stub: nested sampling not available "
                              "in the baseline harness")


NestedSampler = _unavailable
DynamicNestedSampler = _unavailable


class utils:  # dyfunc namespace
    resample_equal = staticmethod(_unavailable)
