"""Parity target: reference validation/utils/mathUtils.py."""

import numpy as np


def is_positive_definite(matrix) -> bool:
    try:
        np.linalg.cholesky(np.asarray(matrix))
        return True
    except np.linalg.LinAlgError:
        return False
