"""Declarative configuration tree for models and experiments.

Replaces the reference's string-registry layer-tuple spec
(``DLWPNeuralNet.build_model(layers=[('LayerName', args, kwargs), ...])`` via
``util.get_from_class`` — SURVEY.md §2 row 6, §5.6) with typed dataclasses:
model assembly is code, config is data, and the whole tree serializes to JSON
alongside checkpoints so a run is reproducible from its artifacts alone.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any

__all__ = [
    "UNetConfig",
    "ConvLSTMConfig",
    "DataConfig",
    "TrainConfig",
    "ExperimentConfig",
]


@dataclass(frozen=True)
class UNetConfig:
    """Cubed-sphere U-Net architecture (Weyn et al. 2020-style).

    3 resolution levels by default; ``filters[i]`` is the channel width at
    level ``i`` (level 0 = full resolution).  Each level applies
    ``convs_per_block`` CS convolutions + activation; downsampling by
    average pooling, upsampling by nearest-neighbor + conv, with skip
    connections concatenated channels-wise.
    """

    kind: str = "unet"
    output_channels: int = 8
    filters: tuple[int, ...] = (32, 64, 128)
    convs_per_block: int = 2
    kernel_size: tuple[int, int] = (3, 3)
    activation: str = "leaky_relu"
    activation_slope: float = 0.1
    pooling: str = "avg"  # 'avg' | 'max'
    upsample: str = "nearest"  # 'nearest' | 'bilinear'
    separate_polar_weights: bool = True
    final_kernel_size: tuple[int, int] = (1, 1)
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16'
    conv_backend: str = "auto"  # 'auto'|'xla'|'pallas'|'pallas_interpret'|'int8'

    def __post_init__(self):
        if len(self.filters) < 1:
            raise ValueError("filters must be non-empty")
        if self.pooling not in ("avg", "max"):
            raise ValueError(f"pooling must be avg|max, got {self.pooling!r}")


@dataclass(frozen=True)
class ConvLSTMConfig:
    """Recurrent (stacked ConvLSTM) forecast network on the cubed sphere.

    The reference's ``is_recurrent=True`` model family (Keras ``ConvLSTM2D``
    assembled by ``DLWPNeuralNet.build_model`` — SURVEY.md §2 rows 5-6).
    ``filters[i]`` is the hidden width of recurrent layer ``i``; all but the
    last return full sequences.  The folded-channel decomposition fields
    (``input_time_steps``/``variable_channels``/``add_insolation``) are
    derived from the DataConfig by ``ExperimentConfig.resolved_model``.
    """

    kind: str = "convlstm"
    output_channels: int = 8
    filters: tuple[int, ...] = (32, 32)
    kernel_size: tuple[int, int] = (3, 3)
    head_kernel_size: tuple[int, int] = (1, 1)
    separate_polar_weights: bool = True
    compute_dtype: str = "float32"
    conv_backend: str = "auto"
    # Folded-input decomposition (see data/channels.py):
    input_time_steps: int = 2
    variable_channels: int = 4
    add_insolation: bool = True

    def __post_init__(self):
        if len(self.filters) < 1:
            raise ValueError("filters must be non-empty")


@dataclass(frozen=True)
class DataConfig:
    """What the model consumes/predicts; mirrors SeriesDataGenerator's knobs
    (SURVEY.md §2 row 9) as static config."""

    grid_n: int = 48
    variables: tuple[str, ...] = ("z500", "z1000", "tau300-700", "t2m")
    input_time_steps: int = 2
    output_time_steps: int = 2
    step_hours: float = 6.0
    # Store samples per model time step (the reference's ``interval``): 2 on
    # 3-hourly data gives dt = 6 h.  step_hours is the MODEL dt — it must
    # equal store_spacing * interval (DLWPEstimator validates).
    interval: int = 1
    add_insolation: bool = True
    constants: tuple[str, ...] = ("topography", "land_sea_mask")

    @property
    def n_variables(self) -> int:
        return len(self.variables)

    @property
    def input_channels(self) -> int:
        c = self.input_time_steps * self.n_variables
        if self.add_insolation:
            c += self.input_time_steps
        c += len(self.constants)
        return c

    @property
    def output_channels(self) -> int:
        return self.output_time_steps * self.n_variables


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 32
    learning_rate: float = 1e-3
    lr_schedule: str = "constant"  # 'constant' | 'cosine' | 'warmup_cosine'
    lr_warmup_steps: int = 1000
    lr_decay_steps: int = 100_000
    optimizer: str = "adam"
    weight_decay: float = 0.0
    # Accumulate gradients over k micro-batches before each optimizer
    # update (optax.MultiSteps): the effective batch is k * batch_size
    # with unchanged peak memory.  The reference has no analog (its only
    # batch lever was the generator batch_size).
    grad_accum_steps: int = 1
    max_epochs: int = 200
    min_epochs: int = 0
    early_stopping_patience: int = 50
    restore_best_weights: bool = True
    checkpoint_every_epochs: int = 1
    area_weighted_loss: bool = False
    loss: str = "mse"  # 'mse' | 'mae'
    grad_clip_norm: float | None = None
    # Fetch step metrics from device every k steps (and at epoch end).
    # 1 = synchronous (old behavior); >1 keeps the host off the critical
    # path — with this environment's ~25 ms dispatch/readback overhead a
    # per-step sync can double real step time (PERF.md).
    metrics_every: int = 8
    # Run k optimizer steps per device dispatch (one jitted lax.scan over k
    # stacked batches).  1 = one dispatch per step; >1 amortizes the host
    # dispatch/roundtrip overhead — essential when per-step compute is small
    # relative to dispatch latency (PERF.md round 2: 56 -> 15 ms/step real
    # trainer wall-clock at fused_steps=8 on the remote-tunnel v5e).
    fused_steps: int = 1
    seed: int = 0


@dataclass(frozen=True)
class ExperimentConfig:
    data: DataConfig = field(default_factory=DataConfig)
    model: Any = field(default_factory=UNetConfig)  # UNetConfig | ConvLSTMConfig
    train: TrainConfig = field(default_factory=TrainConfig)

    def resolved_model(self):
        """Model config with data-derived fields filled in."""
        if isinstance(self.model, ConvLSTMConfig):
            return dataclasses.replace(
                self.model,
                output_channels=self.data.output_channels,
                input_time_steps=self.data.input_time_steps,
                variable_channels=self.data.n_variables,
                add_insolation=self.data.add_insolation,
            )
        return dataclasses.replace(
            self.model, output_channels=self.data.output_channels
        )

    # -- (de)serialization -------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "ExperimentConfig":
        raw = json.loads(text)
        model_raw = raw.get("model", {})
        model_cls = (
            ConvLSTMConfig if model_raw.get("kind") == "convlstm" else UNetConfig
        )
        return cls(
            data=_load(DataConfig, raw.get("data", {})),
            model=_load(model_cls, model_raw),
            train=_load(TrainConfig, raw.get("train", {})),
        )


def _load(cls, raw: dict[str, Any]):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in raw.items():
        if k not in fields:
            raise ValueError(f"unknown {cls.__name__} field {k!r}")
        if isinstance(v, list):
            v = tuple(v)
        kwargs[k] = v
    return cls(**kwargs)
