"""Minimal stand-ins for the reference's heavy dependencies so its GCP
modules (/root/reference/src/models/components/{__init__,gcpnet}.py) can be
*executed* with stock torch to produce golden parity fixtures.

These shims re-implement only the tiny public APIs the reference touches
(torch_scatter.scatter, torch_geometric subgraph/Batch, OmegaConf attribute
dicts, torchtyping/typeguard no-ops) — they are test scaffolding, not part
of the framework.
"""

from __future__ import annotations

import sys
import types
from functools import partial


def _make_torch_scatter(torch):
    mod = types.ModuleType("torch_scatter")

    def scatter(src, index, dim=0, dim_size=None, reduce="sum"):
        assert dim == 0, "shim supports dim=0 only"
        if dim_size is None:
            dim_size = int(index.max()) + 1 if index.numel() else 0
        out = torch.zeros((dim_size,) + src.shape[1:], dtype=src.dtype)
        if src.numel():
            idx = index.reshape((-1,) + (1,) * (src.dim() - 1)).expand_as(src)
            out.scatter_add_(0, idx, src)
        if reduce == "mean":
            count = torch.zeros(dim_size, dtype=src.dtype)
            if index.numel():
                count.scatter_add_(
                    0, index, torch.ones(index.shape, dtype=src.dtype)
                )
            count = count.clamp(min=1)
            out = out / count.reshape((-1,) + (1,) * (src.dim() - 1))
        elif reduce not in ("sum", "add"):
            raise NotImplementedError(reduce)
        return out

    mod.scatter = scatter
    return mod


def _make_torch_geometric(torch):
    tg = types.ModuleType("torch_geometric")
    data = types.ModuleType("torch_geometric.data")
    utils = types.ModuleType("torch_geometric.utils")

    class Batch(types.SimpleNamespace):
        def __getitem__(self, key):
            return getattr(self, key)

    class Data(types.SimpleNamespace):
        pass

    def subgraph(subset, edge_index, edge_attr=None, relabel_nodes=False):
        n = 0
        if edge_index.numel():
            n = int(edge_index.max()) + 1
        if subset.numel():
            n = max(n, int(subset.max()) + 1)
        node_mask = torch.zeros(n, dtype=torch.bool)
        node_mask[subset] = True
        emask = node_mask[edge_index[0]] & node_mask[edge_index[1]]
        ei = edge_index[:, emask]
        ea = edge_attr[emask] if edge_attr is not None else None
        if relabel_nodes:
            mapping = torch.full((n,), -1, dtype=torch.long)
            mapping[subset] = torch.arange(subset.numel())
            ei = mapping[ei]
        return ei, ea

    data.Batch = Batch
    data.Data = Data
    utils.subgraph = subgraph
    tg.data = data
    tg.utils = utils
    return tg, data, utils


class DictConfig(dict):
    """Attribute-access dict matching the slice of omegaconf the reference
    modules use (attr get/set, copy.copy, OmegaConf.to_container)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name, value):
        self[name] = value

    def __copy__(self):
        return DictConfig(dict(self))


def _make_omegaconf():
    mod = types.ModuleType("omegaconf")

    class OmegaConf:
        @staticmethod
        def create(obj=None):
            return DictConfig(obj or {})

        @staticmethod
        def to_container(cfg, throw_on_missing=False, resolve=False):
            return dict(cfg)

    mod.OmegaConf = OmegaConf
    mod.DictConfig = DictConfig
    return mod


def _make_typing_shims():
    torchtyping = types.ModuleType("torchtyping")

    class TensorType:
        def __class_getitem__(cls, item):
            return cls

    torchtyping.TensorType = TensorType
    torchtyping.patch_typeguard = lambda *a, **k: None

    typeguard = types.ModuleType("typeguard")
    typeguard.typechecked = lambda fn=None, **k: fn if fn is not None else (lambda f: f)
    return torchtyping, typeguard


def _make_src_shims(torch):
    """Fake `src` package exposing only get_nonlinearity and NUM_ATOM_TYPES,
    re-implemented from their documented behavior
    (/root/reference/src/models/__init__.py:42-57;
    src/datamodules/components/atom3d_dataset.py:21-33)."""
    import torch.nn as nn
    import torch.nn.functional as F

    src = types.ModuleType("src")
    src.__path__ = []
    models = types.ModuleType("src.models")
    models.__path__ = []

    def get_nonlinearity(nonlinearity=None, slope=1e-2, return_functional=False):
        name = None if nonlinearity is None else nonlinearity.lower().strip()
        if name == "relu":
            return F.relu if return_functional else nn.ReLU()
        if name == "leakyrelu":
            return (
                partial(F.leaky_relu, negative_slope=slope)
                if return_functional
                else nn.LeakyReLU(negative_slope=slope)
            )
        if name == "selu":
            return partial(F.selu) if return_functional else nn.SELU()
        if name == "silu":
            return partial(F.silu) if return_functional else nn.SiLU()
        if name == "sigmoid":
            return torch.sigmoid if return_functional else nn.Sigmoid()
        if name is None:
            return nn.Identity()
        raise NotImplementedError(name)

    models.get_nonlinearity = get_nonlinearity

    datamodules = types.ModuleType("src.datamodules")
    datamodules.__path__ = []
    components = types.ModuleType("src.datamodules.components")
    components.__path__ = []
    atom3d_dataset = types.ModuleType("src.datamodules.components.atom3d_dataset")
    atom3d_dataset.NUM_ATOM_TYPES = 9

    return {
        "src": src,
        "src.models": models,
        "src.datamodules": datamodules,
        "src.datamodules.components": components,
        "src.datamodules.components.atom3d_dataset": atom3d_dataset,
    }


def install_shims():
    import torch

    sys.modules["torch_scatter"] = _make_torch_scatter(torch)
    tg, tg_data, tg_utils = _make_torch_geometric(torch)
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.data"] = tg_data
    sys.modules["torch_geometric.utils"] = tg_utils
    sys.modules["omegaconf"] = _make_omegaconf()
    torchtyping, typeguard = _make_typing_shims()
    sys.modules["torchtyping"] = torchtyping
    sys.modules["typeguard"] = typeguard
    sys.modules.update(_make_src_shims(torch))


def load_reference_modules(ref_root="/root/reference"):
    """Execute the reference's primitives + gcpnet modules under the shims
    and return (components_module, gcpnet_module)."""
    import importlib.util

    install_shims()

    comp_path = f"{ref_root}/src/models/components/__init__.py"
    spec = importlib.util.spec_from_file_location("src.models.components", comp_path)
    comp = importlib.util.module_from_spec(spec)
    comp.__path__ = [f"{ref_root}/src/models/components"]
    sys.modules["src.models.components"] = comp
    spec.loader.exec_module(comp)

    gcp_path = f"{ref_root}/src/models/components/gcpnet.py"
    spec2 = importlib.util.spec_from_file_location(
        "src.models.components.gcpnet", gcp_path
    )
    gcp = importlib.util.module_from_spec(spec2)
    sys.modules["src.models.components.gcpnet"] = gcp
    spec2.loader.exec_module(gcp)
    return comp, gcp
