"""Uncertainty quantification (reference L5: uncertainty/ + uncertain.py)."""

from .gaussian_approximation import GaussianApproximationDensityUncertainty
from .bayesian_laplace import BayesianLaplace
from .hessian import HessianApproximator
from .orchestrator import uncertainty

__all__ = ["GaussianApproximationDensityUncertainty", "BayesianLaplace",
           "HessianApproximator", "uncertainty"]
