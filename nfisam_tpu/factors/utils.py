"""Factor classification helpers (reference ``src/factors/utils.py``)."""
from __future__ import annotations

from typing import List, Tuple

from .factors import BinaryFactor, PriorFactor
from .mixtures import AmbiguousDataAssociationFactor, BinaryFactorWithNullHypo


def classify_factors(factors: List, ranked_classes: List) -> List[List]:
    """Partition factors into the first matching class in ``ranked_classes``
    (reference ``factors/utils.py:8``)."""
    groups: List[List] = [[] for _ in ranked_classes]
    for factor in factors:
        for i, klass in enumerate(ranked_classes):
            if isinstance(factor, klass):
                groups[i].append(factor)
                break
        else:
            raise ValueError("Unknown factor class: " + str(factor))
    return groups


def unpack_prior_binary_nh_da_factors(factors: List) -> Tuple[List, List,
                                                              List, List]:
    """Split into (priors, plain binary, null-hypo, data-association)
    groups — drives the clique simulation schedule
    (reference ``factors/utils.py:22``)."""
    priors, null_hypo, da, binary = classify_factors(
        factors, [PriorFactor, BinaryFactorWithNullHypo,
                  AmbiguousDataAssociationFactor, BinaryFactor])
    return priors, binary, null_hypo, da
