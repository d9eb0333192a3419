"""Production serving: batched rollout service + HTTP front end.

The reference framework stops at notebook-driven inference
(``DLWP/model/extensions.py``); this subsystem is the deployment story for
the TPU rebuild — see :mod:`dlwp_cs_tpu.serve.service`.
"""

from dlwp_cs_tpu.serve.export import (
    ExportedForecastService,
    ExportedForecaster,
    export_forecaster,
)
from dlwp_cs_tpu.serve.http import (
    ForecastHTTPServer,
    ensemble_request,
    forecast_request,
    serve_forever,
)
from dlwp_cs_tpu.serve.service import (
    ForecastService,
    MicroBatcher,
    RequestTimeout,
    ServiceOverloaded,
    ServiceStats,
)

__all__ = [
    "ExportedForecastService",
    "ExportedForecaster",
    "ForecastHTTPServer",
    "ForecastService",
    "MicroBatcher",
    "RequestTimeout",
    "ServiceOverloaded",
    "ServiceStats",
    "ensemble_request",
    "export_forecaster",
    "forecast_request",
    "serve_forever",
]
