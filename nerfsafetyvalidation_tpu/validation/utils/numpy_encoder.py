"""JSON encoder for numpy scalars (reference validation/utils/NumpyEncoder.py)."""

import json

import numpy as np


class NumpyEncoder(json.JSONEncoder):
    def default(self, obj):
        if isinstance(obj, (np.floating,)):
            return float(obj)
        if isinstance(obj, (np.integer,)):
            return int(obj)
        if isinstance(obj, np.bool_):
            return bool(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        if hasattr(obj, "tolist"):  # jax arrays
            return obj.tolist()
        return json.JSONEncoder.default(self, obj)
