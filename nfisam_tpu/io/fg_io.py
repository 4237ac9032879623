"""Text ``.fg`` factor-graph file I/O (exact reference format compat).

Parity with reference ``src/slam/FactorGraphSimulator.py:20-74``: lines are
``Variable <Type> <Space> <name> <truth...>`` and ``Factor <ClassName> ...``.
Files written here parse in the reference and vice versa.
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Tuple

import numpy as np

from ..core.variables import Variable
from ..factors.factors import Factor


def read_variable_and_truth_from_line(line: str) -> Tuple[Variable,
                                                          np.ndarray]:
    var = Variable.construct_from_text(line)
    tok = line.strip().split()
    truth = np.array([float(tok[4 + i]) for i in range(var.dim)]) \
        if len(tok) >= 4 + var.dim else None
    return var, truth


def write_variable_and_truth_to_line(var: Variable,
                                     truth: np.ndarray = None) -> str:
    line = str(var)
    if truth is not None:
        line += " " + " ".join(str(v) for v in np.asarray(truth).reshape(-1))
    return line


def factor_graph_to_string(variables: Iterable[Variable],
                           factors: Iterable[Factor],
                           var_truth: Dict[Variable, np.ndarray] = None
                           ) -> str:
    var_truth = var_truth or {}
    lines = [write_variable_and_truth_to_line(v, var_truth.get(v))
             for v in variables]
    lines += [str(f) for f in factors]
    return "\n".join(lines)


def write_factor_graph_to_file(variables, factors, var_truth,
                               file_name: str) -> None:
    with open(file_name, "w") as f:
        f.write(factor_graph_to_string(variables, factors, var_truth))
        f.write("\n")


def read_factor_graph_from_file(file_name: str) -> Tuple[
        List[Variable], Dict[Variable, np.ndarray], List[Factor]]:
    variables: List[Variable] = []
    truth: Dict[Variable, np.ndarray] = {}
    factors: List[Factor] = []
    with open(file_name) as f:
        for line in f:
            tok = line.strip().split()
            if not tok:
                continue
            if tok[0] == "Variable":
                var, val = read_variable_and_truth_from_line(line)
                variables.append(var)
                if val is not None:
                    truth[var] = val
            elif tok[0] == "Factor":
                factors.append(Factor.construct_from_text(line, variables))
    return variables, truth, factors
