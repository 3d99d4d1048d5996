"""Data loading: transforms.json datasets + pinhole ray generation
(reference L3: nerf/provider.py, nerf/utils.py:52-116)."""

from .rays import get_rays, nerf_matrix_to_ngp, rand_poses
from .provider import NeRFDataset

__all__ = ["get_rays", "nerf_matrix_to_ngp", "rand_poses", "NeRFDataset"]
