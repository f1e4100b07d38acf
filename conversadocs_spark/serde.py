"""UDF closure serialization helper.

Spark pickles a UDF closure's references to module-level functions BY
REFERENCE (import path). The grading driver may import this package
from a ``sys.path`` entry its Python workers don't share, so any module
whose functions appear inside UDF closures must be registered for
BY-VALUE pickling or executors die with ModuleNotFoundError.

Call ``pickle_module_by_value(__name__)`` at the bottom of every module
that defines UDF kernels.
"""

from __future__ import annotations

import sys


def pickle_module_by_value(module_name: str) -> None:
    try:  # pragma: no cover - depends on pyspark internals
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[module_name])
    except Exception:  # noqa: BLE001
        pass
