"""Model registry: instantiate a model from a config mapping.

Equivalent of the reference's `get_model`
(/root/reference/wild_visual_navigation/model/network_register.py:11-55),
which introspects the model module and maps CamelCase class names to
`snake_case`_cfg config keys. Same contract: `cfg["name"]` picks the
class, `cfg[f"{snake}_cfg"]` carries its kwargs.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

from .linear_rnvp import LinearRnvp
from .simple_gcn import SimpleGCN
from .simple_mlp import DoubleMLP, SimpleMLP

_MODELS = {
    "SimpleMLP": SimpleMLP,
    "DoubleMLP": DoubleMLP,
    "SimpleGCN": SimpleGCN,
    "LinearRnvp": LinearRnvp,
}


def camel_to_snake(name: str) -> str:
    """CamelCase -> snake_case, matching network_register.py:24-33
    (SimpleMLP -> simple_mlp, LinearRnvp -> linear_rnvp)."""
    s = re.sub(r"(.)([A-Z][a-z]+)", r"\1_\2", name)
    s = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s)
    return re.sub(r"_+", "_", s).lower()


def get_model(model_cfg: Mapping[str, Any]):
    """Instantiate the flax module named by model_cfg['name'] with the
    kwargs from model_cfg['<snake_name>_cfg']."""
    name = model_cfg["name"]
    if name not in _MODELS:
        raise ValueError(f"Model {name} not registered; have {sorted(_MODELS)}")
    cls = _MODELS[name]
    kwargs = dict(model_cfg.get(f"{camel_to_snake(name)}_cfg", {}))
    # Tolerate list-valued sequence fields from YAML/dataclass configs.
    for k, v in list(kwargs.items()):
        if isinstance(v, list):
            kwargs[k] = tuple(v)
    return cls(**kwargs)


def model_needs_edges(model) -> bool:
    """Graph models (SimpleGCN) take (x, edges, edge_valid); row models
    (SimpleMLP/DoubleMLP/LinearRnvp) take x alone."""
    return isinstance(model, SimpleGCN)


def apply_model(model, params, x, edges=None, edge_valid=None):
    """Uniform apply across row and graph heads. A graph head with no
    edges provided degrades exactly to per-row behavior (gcn_aggregate
    with zero valid edges keeps only the self loop)."""
    import jax.numpy as jnp

    if model_needs_edges(model):
        if edges is None:
            edges = jnp.zeros((2, 0), jnp.int32)
            edge_valid = jnp.zeros((0,), bool)
        return model.apply(params, x, edges, edge_valid)
    return model.apply(params, x)


def init_model(model, rng, feature_dim: int):
    """Init that matches the model's call signature."""
    import jax.numpy as jnp

    if model_needs_edges(model):
        return model.init(rng, jnp.zeros((1, feature_dim)),
                          jnp.zeros((2, 0), jnp.int32), jnp.zeros((0,), bool))
    return model.init(rng, jnp.zeros((1, feature_dim)))
