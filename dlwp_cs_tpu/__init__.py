"""dlwp_cs_tpu — a TPU-native cubed-sphere deep-learning weather framework.

A from-scratch rebuild of the capabilities of jweyn/DLWP-CS (Weyn, Durran &
Caruana 2020) designed for TPU hardware: JAX/XLA for the compute path, Pallas
kernels for the fused halo-exchange convolution stencils, ``jax.sharding`` +
``shard_map`` over device meshes for scale, and a host-side data pipeline that
keeps chips fed without stalls.

Subpackages
-----------
- ``geometry``: cubed-sphere grid spec, face connectivity, insolation.
- ``ops``: halo padding, cubed-sphere convolution (XLA + Pallas), pooling.
- ``models``: U-Net + recurrent ConvLSTM families, configuration / builder,
  CPU-torch mirror (cross-framework oracle).
- ``data``: series windowing, preprocessing, predictor stores, ERA5 retrieval.
- ``remap``: lat-lon <-> cubed-sphere remapping (weights + JAX application).
- ``parallel``: meshes, shardings, distributed halo exchange.
- ``train``: train step, trainer loop, callbacks-equivalents.
- ``rollout``: autoregressive forecasting as an on-device ``lax.scan``.
- ``serve``: production serving — batched rollout service + HTTP front end.
- ``verify``: forecast verification metrics (RMSE/MAE/ACC, baselines).
- ``plot``: plotting helpers.
- ``utils``: checkpointing, logging, misc.
"""

from dlwp_cs_tpu.estimator import DLWPEstimator  # noqa: E402

__all__ = ["DLWPEstimator"]
__version__ = "0.1.0"
