"""String-keyed layer registry + declarative sequential builder.

Capability parity with the reference's ``DLWPNeuralNet.build_model`` workflow,
where a model is a list of ``('LayerName', args, kwargs)`` tuples resolved by
name via ``util.get_from_class`` against keras.layers then DLWP.custom
(SURVEY.md §2 row 6, §2 row 16).  The typed-dataclass U-Net is the preferred
path; this registry exists so reference-style declarative specs keep working.

Example::

    spec = [
        ("CubeSphereConv2D", (), {"features": 32}),
        ("LeakyReLU", (), {"negative_slope": 0.1}),
        ("AvgPool", (2,), {}),
        ("CubeSphereConv2D", (), {"features": 4, "kernel_size": (1, 1)}),
    ]
    model = SequentialSpec(spec=freeze_spec(spec))
"""

from __future__ import annotations

import flax.linen as nn

from dlwp_cs_tpu.models.layers import CubeSphereConv2D
from dlwp_cs_tpu.ops.pooling import cs_avg_pool, cs_max_pool, cs_upsample

__all__ = ["get_layer", "register_layer", "SequentialSpec", "freeze_spec", "LAYERS"]

# Module layers: constructed with (*args, **kwargs) then called on the input.
_MODULES = {
    "CubeSphereConv2D": CubeSphereConv2D,
    "Dense": nn.Dense,
}
# "CubeSphereConvLSTM" is added by models/__init__ via register_layer
# (convlstm.py imports layers.py, so registry can't import it here).

# Stateless ops: called as fn(x, *args, **kwargs).
_FUNCTIONS = {
    "AvgPool": cs_avg_pool,
    "MaxPool": cs_max_pool,
    "UpSampling": cs_upsample,
    "LeakyReLU": lambda x, negative_slope=0.1: nn.leaky_relu(
        x, negative_slope=negative_slope
    ),
    "ReLU": lambda x: nn.relu(x),
    "Tanh": lambda x: nn.tanh(x),
}

LAYERS = {**_MODULES, **_FUNCTIONS}


def register_layer(name: str, fn, *, is_module: bool = False) -> None:
    """Extend the registry (the analog of adding a class to DLWP.custom).

    Re-registering an existing name replaces it consistently in BOTH the
    kind-specific table and the combined view (previously a function
    registered over a module name left the module entry live, so
    ``SequentialSpec`` and ``get_layer`` resolved the same name to two
    different layers).
    """
    _MODULES.pop(name, None)
    _FUNCTIONS.pop(name, None)
    target = _MODULES if is_module else _FUNCTIONS
    target[name] = fn
    LAYERS[name] = fn


def get_layer(name: str):
    """Resolve a layer name; raises KeyError with the known names listed."""
    try:
        return LAYERS[name]
    except KeyError:
        raise KeyError(
            f"unknown layer {name!r}; known: {sorted(LAYERS)}"
        ) from None


def freeze_spec(spec):
    """Make a layer spec hashable so it can be a flax module attribute.

    Converts RECURSIVELY: specs loaded from JSON/YAML carry lists inside the
    args/kwarg values (e.g. ``kernel_size: [3, 3]``), which would make the
    flax module unhashable under jit static args / tabulate / comparison.
    """

    def freeze_value(v):
        if isinstance(v, (list, tuple)):
            return tuple(freeze_value(u) for u in v)
        if isinstance(v, dict):
            return tuple(sorted((k, freeze_value(u)) for k, u in v.items()))
        return v

    out = []
    for name, args, kwargs in spec:
        out.append(
            (
                name,
                tuple(freeze_value(a) for a in args),
                tuple(sorted((k, freeze_value(v)) for k, v in kwargs.items())),
            )
        )
    return tuple(out)


class SequentialSpec(nn.Module):
    """Run a declarative ``(name, args, kwargs)`` layer spec sequentially."""

    spec: tuple

    @nn.compact
    def __call__(self, x):
        for idx, (name, args, kw_items) in enumerate(self.spec):
            kwargs = dict(kw_items)
            if name in _MODULES:
                x = _MODULES[name](*args, **kwargs, name=f"{name.lower()}_{idx}")(x)
            elif name in _FUNCTIONS:
                x = _FUNCTIONS[name](x, *args, **kwargs)
            else:
                raise KeyError(f"unknown layer {name!r}; known: {sorted(LAYERS)}")
        return x
