"""skiing_analysis_pytorch_tpu — alias package.

The framework's implementation package is ``skix`` (TPU-native skiing
analysis); this module re-exports it under the long-form name so both
``import skix`` and ``import skiing_analysis_pytorch_tpu`` work, including
submodule imports (``from skiing_analysis_pytorch_tpu.geometry import …``).
"""

import importlib
import sys

import skix

_SUBMODULES = (
    "agent", "angle", "config", "data", "front_side", "fuse", "geometry",
    "io",
    "metrics", "models", "ops", "parallel", "perception", "pipelines",
    "solvers", "tracking", "utils", "vis",
)

for _sub in _SUBMODULES:
    try:
        _mod = importlib.import_module(f"skix.{_sub}")
    except ImportError:  # optional heavy deps may be missing
        continue
    sys.modules[f"{__name__}.{_sub}"] = _mod
    globals()[_sub] = _mod

__version__ = skix.__version__
