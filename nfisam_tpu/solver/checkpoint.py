"""Checkpoint / resume of clique density models.

The reference has NO model persistence — flows live only in memory
(``_clique_density_model`` dict, FactorGraphSolver.py:99; SURVEY §5) and a
crashed run retrains everything.  Here every trained clique flow is
persisted keyed by a *clique signature* (variables + in-clique column
ordering + factor fingerprint + flow config), so:

* a restarted incremental run warm-starts from disk: untouched cliques
  load instead of retrain;
* signatures invalidate automatically when the clique's factors change.

Storage is a directory of ``.npz`` files (one per clique) plus a JSON
manifest — flow parameter pytrees are small (KBs); orbax would be
overkill and this format is hand-inspectable.
"""
from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, List, Optional

import jax
import numpy as np

from ..flows.model import CliqueFlowModel
from ..flows.nsf import NSFConfig
from ..graph.bayes_tree import CliqueNode


def clique_signature(clique: CliqueNode, column_vars, factors,
                     cfg: NSFConfig) -> str:
    """Stable content hash identifying a trained clique model."""
    h = hashlib.sha256()
    h.update(",".join(sorted(str(v.name) for v in clique.frontal)).encode())
    h.update(b"|")
    h.update(",".join(sorted(str(v.name)
                             for v in clique.separator)).encode())
    h.update(b"|")
    h.update(",".join(str(v.name) for v in column_vars).encode())
    h.update(b"|")
    # FlowsPriorFactor string forms carry a content tag so a clique is
    # invalidated when an upstream (child) flow was re-trained
    descs = []
    for f in factors:
        desc = str(f)
        tag = getattr(f, "content_tag", None)
        if tag is not None:
            desc += "#" + tag
        descs.append(desc)
    for d in sorted(descs):
        h.update(d.encode())
        h.update(b";")
    h.update(repr(cfg).encode())
    return h.hexdigest()[:24]


class CliqueModelStore:
    def __init__(self, directory: str) -> None:
        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        self._manifest_path = os.path.join(directory, "manifest.json")
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                self.manifest = json.load(f)
        else:
            self.manifest = {}

    def _flush_manifest(self) -> None:
        with open(self._manifest_path, "w") as f:
            json.dump(self.manifest, f, indent=1)

    # ---------------------------------------------------------------- save
    def save(self, signature: str, model: CliqueFlowModel) -> None:
        arrays: Dict[str, np.ndarray] = {
            "mean": np.asarray(model.mean),
            "std": np.asarray(model.std),
        }
        for i, flow in enumerate(model.flow_params):
            for k, v in flow.items():
                arrays[f"flow{i}_{k}"] = np.asarray(v)
        path = os.path.join(self.directory, f"{signature}.npz")
        np.savez(path, **arrays)
        self.manifest[signature] = {
            "cfg": {
                "dim": model.cfg.dim,
                "num_knots": model.cfg.num_knots,
                "tail_bound": model.cfg.tail_bound,
                "hidden_dim": model.cfg.hidden_dim,
                "num_flows": model.cfg.num_flows,
                "circular": list(model.cfg.circular),
            },
            "circular_dim_list": [bool(c)
                                  for c in model.circular_dim_list],
            "aug_sep_dim": model.aug_sep_dim,
            "pad_dims": model.pad_dims,
            "content_tag": model.content_tag,
        }
        self._flush_manifest()

    # ---------------------------------------------------------------- load
    def load(self, signature: str) -> Optional[CliqueFlowModel]:
        meta = self.manifest.get(signature)
        path = os.path.join(self.directory, f"{signature}.npz")
        if meta is None or not os.path.exists(path):
            return None
        data = np.load(path)
        cfg = NSFConfig(dim=meta["cfg"]["dim"],
                        num_knots=meta["cfg"]["num_knots"],
                        tail_bound=meta["cfg"]["tail_bound"],
                        hidden_dim=meta["cfg"]["hidden_dim"],
                        num_flows=meta["cfg"]["num_flows"],
                        circular=tuple(meta["cfg"]["circular"]))
        flow_params: List[dict] = []
        for i in range(cfg.num_flows):
            flow_params.append({
                k.split("_", 1)[1]: jax.numpy.asarray(data[k])
                for k in data.files if k.startswith(f"flow{i}_")})
        return CliqueFlowModel(
            cfg=cfg, flow_params=flow_params,
            mean=jax.numpy.asarray(data["mean"]),
            std=jax.numpy.asarray(data["std"]),
            circular_dim_list=list(meta["circular_dim_list"]),
            aug_sep_dim=int(meta["aug_sep_dim"]),
            pad_dims=int(meta.get("pad_dims", 0)),
            content_tag=str(meta.get("content_tag", "")))

    def __contains__(self, signature: str) -> bool:
        return signature in self.manifest
